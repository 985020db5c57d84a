from spef_tpu.quant.bitwidth import default_bit_width, load_bit_width, save_bit_width  # noqa: F401
from spef_tpu.quant.convert import convert_qat_params  # noqa: F401
from spef_tpu.quant.int8_model import (  # noqa: F401
    build_int8_forward,
    build_weight_only_forward,
)
from spef_tpu.quant.int8_pallas import build_pallas_forward  # noqa: F401
from spef_tpu.quant.parity import compare_tensors, predict_and_compare  # noqa: F401
