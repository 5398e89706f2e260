"""Pallas TPU kernels (L2): elementwise codec bit-ops, PRNG fault injection,
and the fused paged-attention kernels with inline ECC decode.

Mirrors the reference's kernel layer (ecc_codecs/triton_kernels +
kv_cache/attention_ecc.py) re-designed for the TPU memory system - see
paged_attention.py's module docstring for the layout/DMA design notes.
"""

from .codec_kernels import (
    golay_decode_packed_tpu,
    golay_decode_tpu,
    golay_encode_packed_tpu,
    golay_encode_tpu,
    hamming74_decode_tpu,
    hamming74_encode_tpu,
    hamming84_decode_tpu,
    hamming84_encode_tpu,
    inject_bit_errors_tpu,
)
from .paged_attention import (
    paged_attention_ecc,
    paged_attention_ecc_reference,
    paged_attention_ecc_write_attend,
)

__all__ = [
    "golay_decode_packed_tpu",
    "golay_decode_tpu",
    "golay_encode_packed_tpu",
    "golay_encode_tpu",
    "hamming74_decode_tpu",
    "hamming74_encode_tpu",
    "hamming84_decode_tpu",
    "hamming84_encode_tpu",
    "inject_bit_errors_tpu",
    "paged_attention_ecc",
    "paged_attention_ecc_reference",
    "paged_attention_ecc_write_attend",
]
