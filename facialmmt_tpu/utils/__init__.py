from facialmmt_tpu.utils.observability import MetricWriter, StepTimer, trace_span
