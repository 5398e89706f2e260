"""Unprotected INT4 control arm.

Port of the reference's kv_cache/unprotected_shim.py: the fair-comparison
baseline with identical INT4 quantization and paging but no ECC, plus
measured-BER accounting (bits_flipped / total_bits -> actual_ber,
unprotected_shim.py:131-133, 555-574). Demonstrates the catastrophic
PPL blow-up at BER 1e-2 that the protected arms prevent.

In this framework the unprotected arm is the codec="int4" configuration of
the same engine/policy machinery (one code path, no parallel shim class) -
this module pins that contract and provides the reference-named accessors.
"""

from __future__ import annotations

import dataclasses

from .engine import ECCEngine, ECCEngineConfig


@dataclasses.dataclass
class UnprotectedEngineConfig(ECCEngineConfig):
    """Forces codec='int4' with READ-time injection (reference
    UnprotectedShimConfig forces codec='int4', unprotected_shim.py:108, and
    its backend injects fresh flips on the raw nibbles at every attend,
    :276-302 - so during generation the same cached token is re-corrupted
    independently each step, unlike the protected arms' persistent
    write-time corruption)."""

    def __post_init__(self):
        self.codec = "int4"
        self.inject_at = "read"
        super().__post_init__()


class UnprotectedBackend(ECCEngine):
    """INT4 write/attend with Bernoulli read-time bit flips, no correction."""

    def __init__(self, config: UnprotectedEngineConfig, num_layers, num_heads,
                 num_kv_heads, head_dim):
        if not isinstance(config, UnprotectedEngineConfig):
            config = UnprotectedEngineConfig(
                ber=config.ber,
                block_size=config.block_size,
                num_blocks=config.num_blocks,
                inject_errors=config.inject_errors,
                seed=config.seed,
            )
        super().__init__(config, num_layers, num_heads, num_kv_heads, head_dim)


def get_unprotected_stats(engine: ECCEngine) -> dict:
    """Measured corruption statistics (reference unprotected_shim.py:555)."""
    s = engine.stats
    return {
        "bits_flipped": s["bits_flipped"],
        "total_bits": s["total_bits"],
        "actual_ber": s["actual_ber"],
        "total_values": s["total_values"],
        "injection_count": s["injection_count"],
    }
