from spef_tpu.temporal.pdf_filter import TemporalPDF, compute_distance, scan_filter  # noqa: F401
from spef_tpu.temporal.inference import Inference, sequence_inference  # noqa: F401
