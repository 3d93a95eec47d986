from .compare_stream import stream_avro_jsonl, streaming_findings
from .running_stats_stream import running_stats_stream
from .sessionize_stream import sessionize_stream
from .windowed_agg import windowed_event_counts

__all__ = [
    "stream_avro_jsonl",
    "streaming_findings",
    "running_stats_stream",
    "sessionize_stream",
    "windowed_event_counts",
]
