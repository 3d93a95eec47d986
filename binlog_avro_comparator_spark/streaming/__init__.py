from .compare_stream import stream_avro_jsonl, streaming_findings

__all__ = ["stream_avro_jsonl", "streaming_findings"]
