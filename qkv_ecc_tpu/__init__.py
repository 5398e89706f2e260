"""qkv_ecc_tpu: a TPU-native (JAX/XLA/Pallas/pjit) inference framework whose
transformer KV cache is stored as INT4 values protected by algebraic
error-correcting codes (Hamming(7,4), Hamming(8,4) SECDED, Golay(24,12)),
with a Monte-Carlo fault-injection evaluation harness.

Brand-new TPU-first implementation of the capabilities of the reference
framework `indrajeetadityaroy9/quantized-kv-cache-ecc-protection`
(CUDA/Triton/PyTorch). See SURVEY.md at the repo root for the layer map.

Layers:
    codecs/      L1: quantizers, ECC codecs, fault injection, interpolation
    kernels/     Pallas TPU kernels (codec bit-ops, fused paged attention)
    cache/       L2/L3: paged ECC cache layout, block manager, engine
    models/      native JAX model definitions (GPT-2, Llama/Mistral family)
    parallel/    mesh / sharding / multi-host collectives
    evaluation/  L4: metrics, Monte-Carlo sweep, verification, experiments
"""

__version__ = "0.1.0"
