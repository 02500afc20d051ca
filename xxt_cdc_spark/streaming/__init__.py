from xxt_cdc_spark.streaming.pipeline import CDCStreamPipeline, read_envelope_stream

__all__ = ["CDCStreamPipeline", "read_envelope_stream"]
