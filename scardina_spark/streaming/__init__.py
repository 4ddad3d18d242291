from .events import (  # noqa: F401
    clicks_to_purchases_stream,
    read_events_stream,
    sessionized_stream,
    windowed_counts_stream,
    run_to_memory_sink,
)
from .stateful import first_seen_dedup_stream  # noqa: F401
from .neardup import (  # noqa: F401
    build_neardup_index,
    near_dup_probe_stream,
)
