"""Product quantization / asymmetric hashing: codebooks, lookup tables,
LUT16 packing, hasher, stacked/additive residual quantizers."""

from scann_tpu.hashes.codebook import Codebook, CodebookConfig
from scann_tpu.hashes.lut import LookupTable, LookupTableInt8
from scann_tpu.hashes.lut16 import PackedCodes4Bit, Lut16SimdTables
from scann_tpu.hashes.hasher import AsymmetricHasher, AsymmetricHasherConfig

__all__ = [
    "Codebook",
    "CodebookConfig",
    "LookupTable",
    "LookupTableInt8",
    "PackedCodes4Bit",
    "Lut16SimdTables",
    "AsymmetricHasher",
    "AsymmetricHasherConfig",
]
