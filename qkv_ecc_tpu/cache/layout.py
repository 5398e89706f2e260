"""Physical layout of the paged ECC KV cache in TPU HBM.

TPU-native redesign of the reference's memory layout
(kv_cache/memory_layout.py). Differences, by design:

  * Per-layer cache arrays shaped [num_blocks, num_kv_heads, W, block_size]
    - TOKENS ON THE MINOR DIMENSION (the reference used [blocks, layers,
    heads, flat] with tokens major). Three reasons, all TPU-hardware driven:
    (a) Mosaic requires the minor dim of HBM slices to be 128-lane aligned,
    so a block_size of 128 makes every (block, head) page directly DMA-able
    regardless of the codec's word count; (b) the decoded page IS
    K-transposed [head_dim, tokens], exactly the RHS the QK^T matmul wants -
    no in-kernel transpose; (c) per-token scales broadcast along sublanes
    for free. The layer dimension is stacked on axis 0 of a single array per
    cache so one dynamic-slice selects a layer under jit.
  * Storage is BIT-PACKED int32 words (kernels/swar.py): int4 8 values/word
    (4.0 bits/value), hamming74 int4-packed data + 3 bit-sliced parity
    planes (7.0), hamming84 data + parity nibble halves (8.0), golay data
    nibbles + parity planes (8.0).
    The reference stored one codeword per uint8/int32 element, wasting bit 7
    of every Hamming byte and 8/32 bits of every Golay word
    (ecc_codecs/triton_kernels/config.py:41-70); round 1 of this framework
    did the same. Packing halves the unprotected-INT4 decode step's KV
    traffic and lets the fused kernel decode 4-32 values per VPU op.
  * Rows are DATA-FIRST and PHYSICALLY SPLIT (round 5): the int4-packed
    data nibbles live in k_cache/v_cache - arrays byte-identical to the
    unprotected int4 cache - and the parity suffix in separate
    k_parity/v_parity arrays with the same token-minor page layout.
    Scrub-mode reads (the default) DMA and decode ONLY the data arrays with
    fully CONTIGUOUS page copies (round 4 measured ~0.08 ms per attended
    page for the strided prefix-of-row DMAs the single-array layout forced,
    plus ~0.13 ms/step of parity-row read-modify-write in the fused write;
    the split removes both - docs/split_parity_design.md). Correcting reads
    (always-decode / stats / interpolation) stream BOTH arrays as two
    contiguous streams.
  * Scales are [num_blocks, num_kv_heads, block_size] fp32 (per token per
    head), matching the reference's per-position scale granularity.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..kernels.swar import (
    data_words as _data_words,
    padded_values,
    parity_words as _parity_words,
    row_words as _row_words,
)

CODEC_CHOICES = ("fp16", "fp8", "int4", "hamming74", "hamming84", "golay")


def cache_dtype_for(codec: str):
    if codec in ("int4", "hamming74", "hamming84", "golay"):
        return jnp.int32  # bit-packed storage words
    if codec == "fp16":
        return jnp.bfloat16  # TPU-native 16-bit float
    if codec == "fp8":
        return jnp.float8_e4m3fn
    raise ValueError(f"Unknown codec: {codec}")


def storage_bits_per_value(codec: str) -> float:
    """PHYSICAL bits per protected value in the packed layout (the
    reference's memory_layout.py:39 reported these same numbers but its
    storage spent 8/8/8/10.67 - it allocated a full uint8/int32 element per
    codeword)."""
    return {
        "fp16": 16.0,
        "fp8": 8.0,
        "int4": 4.0,
        "hamming74": 7.0,
        "hamming84": 8.0,
        "golay": 8.0,  # 24 bits / 3 values, packed 4 codewords per 3 words
    }[codec]


@dataclasses.dataclass(frozen=True)
class ECCCacheConfig:
    """Static configuration of a paged ECC KV cache
    (reference kv_cache/memory_layout.py:5)."""

    num_blocks: int = 256
    block_size: int = 128
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
    def row_words(self) -> int:
        """Storage elements per (token, head) row: packed int32 words for
        the integer codecs, raw values for fp16/fp8. The row is stored
        SPLIT: its data_words prefix in k_cache/v_cache, its parity_words
        suffix in k_parity/v_parity (see data_words docstring)."""
        return _row_words(self.codec, self.head_dim)

    @property
    def data_words(self) -> int:
        """Words per row of the DATA cache arrays: the int4-style-packed
        value nibbles. Byte-identical layout to the unprotected int4 cache,
        so scrub-mode reads issue exactly the contiguous page DMAs int4
        issues (round-5 split layout, docs/split_parity_design.md)."""
        return _data_words(self.codec, self.head_dim)

    @property
    def parity_words(self) -> int:
        """Words per row of the PARITY arrays (0: no parity arrays exist -
        int4, fp16, fp8)."""
        return _parity_words(self.codec, self.head_dim)

    @property
    def padded_head_dim(self) -> int:
        """head_dim rounded up to the codec's packing granularity."""
        return padded_values(self.codec, self.head_dim)

    @property
    def cache_dtype(self):
        return cache_dtype_for(self.codec)

    @property
    def needs_scales(self) -> bool:
        return self.codec not in ("fp16", "fp8")

    @property
    def words_per_block(self) -> int:
        return self.block_size * self.row_words

    @property
    def storage_overhead_vs_int4(self) -> float:
        """Bit overhead relative to bare INT4 (reference memory_layout.py:39)."""
        return storage_bits_per_value(self.codec) / 4.0

    @property
    def max_tokens(self) -> int:
        return self.num_blocks * self.block_size

    def cache_shape(self):
        """Shape of one of k_cache / v_cache (all layers stacked): the DATA
        arrays of the split layout - data_words per row, byte-identical to
        the int4 cache for every ECC codec.

        Tokens (block_size) are the minor dim - see module docstring."""
        return (
            self.num_layers,
            self.num_blocks,
            self.num_kv_heads,
            self.data_words,
            self.block_size,
        )

    def parity_shape(self):
        """Shape of k_parity / v_parity (None when the codec has no parity:
        int4, fp16, fp8). Same token-minor page layout as the data arrays."""
        if self.parity_words == 0:
            return None
        return (
            self.num_layers,
            self.num_blocks,
            self.num_kv_heads,
            self.parity_words,
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

    Returns dict with k_cache, v_cache, k_scales, v_scales, plus
    k_parity/v_parity for the ECC codecs (split data/parity layout). With
    `sharding`, a jax.sharding.NamedSharding is applied (kv-heads axis on
    the model axis).
    """
    kw = {"device": sharding} if sharding is not None else {}
    out = {
        "k_cache": jnp.zeros(config.cache_shape(), config.cache_dtype, **kw),
        "v_cache": jnp.zeros(config.cache_shape(), config.cache_dtype, **kw),
        "k_scales": jnp.zeros(config.scales_shape(), jnp.float32, **kw),
        "v_scales": jnp.zeros(config.scales_shape(), jnp.float32, **kw),
    }
    pshape = config.parity_shape()
    if pshape is not None:
        out["k_parity"] = jnp.zeros(pshape, config.cache_dtype, **kw)
        out["v_parity"] = jnp.zeros(pshape, config.cache_dtype, **kw)
    return out


def create_block_table(max_seqs: int, max_blocks_per_seq: int):
    """Logical->physical block table, -1 sentinel for unallocated
    (reference memory_layout.py:71)."""
    return jnp.full((max_seqs, max_blocks_per_seq), -1, dtype=jnp.int32)


def compute_slot_mapping(positions, block_size: int):
    """token position -> (logical_block, slot) (reference memory_layout.py:101)."""
    positions = jnp.asarray(positions)
    return positions // block_size, positions % block_size
