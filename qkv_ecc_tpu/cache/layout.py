"""Physical layout of the paged ECC KV cache in TPU HBM.

TPU-native redesign of the reference's memory layout
(kv_cache/memory_layout.py). Differences, by design:

  * Per-layer cache arrays shaped [num_blocks, num_kv_heads, CW, block_size]
    - TOKENS ON THE MINOR DIMENSION (the reference used [blocks, layers,
    heads, flat] with tokens major). Three reasons, all TPU-hardware driven:
    (a) Mosaic requires the minor dim of HBM slices to be 128-lane aligned,
    so a block_size of 128 makes every (block, head) page directly DMA-able
    regardless of the codec's codeword count (Golay's 43 int32 codewords per
    row could never satisfy lane alignment as a minor dim); (b) the decoded
    page IS K-transposed [head_dim, tokens], exactly the RHS the QK^T matmul
    wants - no in-kernel transpose; (c) per-token scales broadcast along
    sublanes for free. The layer dimension is stacked on axis 0 of a single
    array per cache so one dynamic-slice selects a layer under jit.
  * Golay packing is THIRD-PARTITIONED, not adjacent-triplet: codeword j of a
    head-dim row protects values (j, j + CW, j + 2*CW). Decoding a block then
    yields three contiguous [block_size, CW] nibble planes that concatenate
    along lanes - no stride-3 interleave on the VPU. Protection statistics are
    identical (any 3 values per 24-bit codeword); only the mapping differs
    from the reference's adjacent triplets (kv_cache/ecc_shim.py:678).
  * Scales are [num_blocks, num_kv_heads, block_size] fp32 (per token per
    head), matching the reference's per-position scale granularity.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp

CODEC_CHOICES = ("fp16", "fp8", "int4", "hamming74", "hamming84", "golay")


def golay_codewords_per_row(head_dim: int) -> int:
    return -(-head_dim // 3)


def cache_dtype_for(codec: str):
    if codec in ("int4", "hamming74", "hamming84"):
        return jnp.uint8
    if codec == "golay":
        return jnp.int32
    if codec == "fp16":
        return jnp.bfloat16  # TPU-native 16-bit float
    if codec == "fp8":
        return jnp.float8_e4m3fn
    raise ValueError(f"Unknown codec: {codec}")


def storage_bits_per_value(codec: str) -> float:
    """Logical bits per protected value (reference memory_layout.py:39)."""
    return {
        "fp16": 16.0,
        "fp8": 8.0,
        "int4": 8.0,  # one uint8 slot per nibble in the baseline layout
        "hamming74": 8.0,  # 7-bit codeword in a uint8 slot
        "hamming84": 8.0,
        "golay": 32.0 / 3.0,  # 24-bit codeword/3 values in an int32 slot
    }[codec]


@dataclasses.dataclass(frozen=True)
class ECCCacheConfig:
    """Static configuration of a paged ECC KV cache
    (reference kv_cache/memory_layout.py:5)."""

    num_blocks: int = 256
    block_size: int = 16
    num_layers: int = 12
    num_kv_heads: int = 12
    head_dim: int = 64
    codec: str = "hamming84"
    max_seqs: int = 32

    def __post_init__(self):
        if self.codec not in CODEC_CHOICES:
            raise ValueError(
                f"Unsupported codec '{self.codec}'; choose from {CODEC_CHOICES}"
            )

    @property
    def row_codewords(self) -> int:
        """Storage elements per (token, head) row."""
        if self.codec == "golay":
            return golay_codewords_per_row(self.head_dim)
        return self.head_dim

    @property
    def padded_head_dim(self) -> int:
        """head_dim rounded up to the codec's packing granularity."""
        if self.codec == "golay":
            return 3 * self.row_codewords
        return self.head_dim

    @property
    def cache_dtype(self):
        return cache_dtype_for(self.codec)

    @property
    def needs_scales(self) -> bool:
        return self.codec not in ("fp16", "fp8")

    @property
    def codewords_per_block(self) -> int:
        return self.block_size * self.row_codewords

    @property
    def storage_overhead_vs_int4(self) -> float:
        """Bit overhead relative to bare INT4 (reference memory_layout.py:39)."""
        bits = {
            "fp16": 16,
            "fp8": 8,
            "int4": 4,
            "hamming74": 7,
            "hamming84": 8,
            "golay": 8,
        }[self.codec]
        return bits / 4.0

    @property
    def max_tokens(self) -> int:
        return self.num_blocks * self.block_size

    def cache_shape(self):
        """Shape of one of k_cache / v_cache (all layers stacked).

        Tokens (block_size) are the minor dim - see module docstring."""
        return (
            self.num_layers,
            self.num_blocks,
            self.num_kv_heads,
            self.row_codewords,
            self.block_size,
        )

    def scales_shape(self):
        return (
            self.num_layers,
            self.num_blocks,
            self.num_kv_heads,
            self.block_size,
        )


def allocate_ecc_kv_cache(config: ECCCacheConfig, sharding=None):
    """Allocate zeroed cache tensors (reference memory_layout.py:56).

    Returns dict with k_cache, v_cache, k_scales, v_scales. With `sharding`, a
    jax.sharding.NamedSharding is applied (kv-heads axis on the model axis).
    """
    kw = {"device": sharding} if sharding is not None else {}
    k_cache = jnp.zeros(config.cache_shape(), config.cache_dtype, **kw)
    v_cache = jnp.zeros(config.cache_shape(), config.cache_dtype, **kw)
    k_scales = jnp.zeros(config.scales_shape(), jnp.float32, **kw)
    v_scales = jnp.zeros(config.scales_shape(), jnp.float32, **kw)
    return {
        "k_cache": k_cache,
        "v_cache": v_cache,
        "k_scales": k_scales,
        "v_scales": v_scales,
    }


def create_block_table(max_seqs: int, max_blocks_per_seq: int):
    """Logical->physical block table, -1 sentinel for unallocated
    (reference memory_layout.py:71)."""
    return jnp.full((max_seqs, max_blocks_per_seq), -1, dtype=jnp.int32)


def compute_slot_mapping(positions, block_size: int):
    """token position -> (logical_block, slot) (reference memory_layout.py:101)."""
    positions = jnp.asarray(positions)
    return positions // block_size, positions % block_size


def pack_thirds(nibbles: jax.Array) -> jax.Array:
    """Pack [..., padded_head_dim] INT4 values into [..., CW] 12-bit words
    using third-partitioned packing: word j = x[j] | x[j+CW]<<4 | x[j+2CW]<<8."""
    n = nibbles.astype(jnp.int32) & 0xF
    cw = n.shape[-1] // 3
    return n[..., :cw] | (n[..., cw : 2 * cw] << 4) | (n[..., 2 * cw :] << 8)


def unpack_thirds(data12: jax.Array) -> jax.Array:
    """Inverse of pack_thirds: [..., CW] -> [..., 3*CW] uint8 nibbles."""
    d = data12.astype(jnp.int32)
    return jnp.concatenate(
        [(d >> 0) & 0xF, (d >> 4) & 0xF, (d >> 8) & 0xF], axis=-1
    ).astype(jnp.uint8)
