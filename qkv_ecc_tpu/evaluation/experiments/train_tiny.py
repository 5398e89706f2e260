"""Train the in-container byte-level model that backs the `trained-tiny`
quality tables.

    python -m qkv_ecc_tpu.evaluation.experiments.train_tiny \
        --steps 4000 --output results/trained_tiny/checkpoint.npz

Then run the publication sweep on it:

    python -m qkv_ecc_tpu.evaluation.experiments.monte_carlo \
        --model trained-tiny --output-dir results/trained_tiny_tpu

Why this exists: the reference's headline result (unprotected INT4 blows up
catastrophically at BER 1e-2 while ECC-protected caches hold,
results/gpt2_publication/results_table.txt:5-8) is invisible on a
random-init model, and this environment cannot download HF checkpoints.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument(
        "--model", default="trained-tiny",
        choices=["trained-tiny", "trained-word", "trained-100m"],
        help="trained-tiny: byte-level; trained-word: 8k word vocab "
        "(enough PPL dynamic range for the catastrophic-INT4 demo); "
        "trained-100m: ~100M-param llama-arch GQA word-level model",
    )
    p.add_argument("--steps", type=int, default=4000)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--seq-len", type=int, default=256)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max-corpus-mb", type=int, default=32)
    p.add_argument(
        "--output", default=None,
        help="checkpoint path (.npz); default results/<model>/checkpoint.npz",
    )
    args = p.parse_args(argv)
    if args.output is None:
        args.output = f"results/{args.model.replace('-', '_')}/checkpoint.npz"

    from ...models.config import get_model_config
    from ...training import TrainConfig, build_corpus, save_params, train_tiny

    cfg = get_model_config(args.model)
    t0 = time.time()
    corpus, eval_texts = build_corpus(max_bytes=args.max_corpus_mb << 20)
    print(
        f"corpus: {len(corpus)/1e6:.1f} MB train, {len(eval_texts)} held-out "
        f"eval texts ({time.time()-t0:.1f}s)",
        file=sys.stderr,
    )
    if args.model in ("trained-word", "trained-100m"):
        from ...training.corpus import WordTokenizer
        import numpy as np

        text = corpus.decode("utf-8", errors="replace")
        tok = WordTokenizer.train(text, vocab_size=cfg.vocab_size)
        corpus = np.asarray(tok.encode(text), np.int32)
        print(
            f"word tokenizer: vocab {tok.vocab_size}, corpus "
            f"{len(corpus)/1e6:.1f}M tokens ({time.time()-t0:.1f}s)",
            file=sys.stderr,
        )

    tcfg = TrainConfig(
        steps=args.steps, batch=args.batch, seq_len=args.seq_len,
        lr=args.lr, seed=args.seed,
    )

    def progress(step, loss, elapsed):
        print(
            f"  step {step:5d}/{tcfg.steps}  loss {loss:.4f} nats/byte "
            f"(ppl/byte {2.718281828**loss:.2f})  {elapsed:.0f}s",
            file=sys.stderr, flush=True,
        )

    params, final_loss = train_tiny(cfg, corpus, tcfg, progress)
    save_params(params, args.output, cfg)
    if args.model in ("trained-word", "trained-100m"):
        tok.save(args.output + ".vocab.json")

    # persist the held-out eval texts next to the checkpoint so the sweep
    # evaluates on data the model never trained on
    texts_path = args.output + ".eval_texts.json"
    with open(texts_path, "w") as fh:
        json.dump(eval_texts, fh)
    print(
        f"saved {args.output} (final loss {final_loss:.4f} nats/byte) and "
        f"{texts_path}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
