from .exact import ExactEstimator  # noqa: F401
from .sample import SampleEstimator, prepare_tree_sample, TreeSample  # noqa: F401
from .stitch import StitchedEstimator  # noqa: F401
from .hybrid import HybridEstimator  # noqa: F401
