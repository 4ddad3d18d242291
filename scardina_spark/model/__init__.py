from .nar import NarMLP, TrainConfig  # noqa: F401
from .progressive import NarEstimator, ColumnDomain  # noqa: F401
