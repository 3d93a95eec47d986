from .compare_stream import stream_avro_jsonl, streaming_findings
from .sessionize_stream import sessionize_stream

__all__ = ["stream_avro_jsonl", "streaming_findings", "sessionize_stream"]
