from kgpipe.streaming.ops import (  # noqa: F401
    IdempotentTripleSink,
    incremental_triples,
    read_events_stream,
    read_transcripts_stream,
    session_counts_stream,
    sliding_counts_stream,
    stream_dedup,
    tumbling_counts_stream,
    write_triples_stream,
)
