"""Quantization: dataset statistics, int8/int4 scalar quantization,
bfloat16 and fp8 datasets."""

from scann_tpu.quantization.stats import QuantizationStats
from scann_tpu.quantization.scalar import ScalarQuantizer, ScalarQuantizerConfig, QuantizedDataset
from scann_tpu.quantization.bfloat16 import BFloat16Dataset
from scann_tpu.quantization.fp8 import Fp8Format, Fp8Quantizer, Fp8Dataset

__all__ = [
    "QuantizationStats",
    "ScalarQuantizer",
    "ScalarQuantizerConfig",
    "QuantizedDataset",
    "BFloat16Dataset",
    "Fp8Format",
    "Fp8Quantizer",
    "Fp8Dataset",
]
