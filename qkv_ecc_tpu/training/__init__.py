"""In-container tiny-model training.

The reference's quality tables were produced on HF-pretrained GPT-2 /
LLaMA-3.1 checkpoints (evaluation/models.py:16) which this environment
cannot download (zero egress). A random-init model cannot demonstrate the
framework's reason to exist - at BER 1e-2 its perplexity barely moves
because its predictions carry no information to destroy. This package
trains a small byte-level language model on text available INSIDE the
container (Python library sources + license texts) so the publication
sweep runs on a model whose perplexity genuinely degrades under KV-cache
corruption: unprotected INT4 blows up catastrophically at BER 1e-2 while
the ECC-protected modes hold - the reference's headline phenomenon
(results/gpt2_publication/results_table.txt:5-8) reproduced end-to-end on
TPU with local data.
"""

from .corpus import build_corpus
from .trainer import TrainConfig, load_params, save_params, train_tiny

__all__ = [
    "build_corpus",
    "TrainConfig",
    "train_tiny",
    "save_params",
    "load_params",
]
