"""Precompute CLIP text embeddings for offline query/eval/edit workflows.

  python -m gags_tpu.cli.encode_text --clip_ckpt ViT-B-16.pt --bpe vocab.gz \
      --labels "sheep,bear,teapot" -o embeds.npz

Writes npz with 'labels', 'pos' (L, 512) and 'neg' (4, 512) unit-norm
embeddings (negatives = object/things/stuff/texture, preprocess.py:46).
"""

from __future__ import annotations

import argparse

import numpy as np
import jax
import jax.numpy as jnp

from gags_tpu.models.clip import CLIP, load_openclip_checkpoint
from gags_tpu.models.tokenizer import ClipTokenizer
from gags_tpu.query.relevancy import DEFAULT_NEGATIVES


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--clip_ckpt", required=True)
    p.add_argument("--bpe", default="")
    p.add_argument("--labels", required=True, help="comma-separated prompts")
    p.add_argument("-o", "--output", required=True)
    args = p.parse_args()

    labels = [s.strip() for s in args.labels.split(",") if s.strip()]
    params, cfg = load_openclip_checkpoint(args.clip_ckpt)
    tok = ClipTokenizer(args.bpe or None)
    model = CLIP(cfg)
    enc = jax.jit(lambda t: model.apply(params, method="encode_text", tokens=t))

    def embed(texts):
        e = np.asarray(enc(jnp.asarray(tok(texts))))
        return e / np.linalg.norm(e, axis=-1, keepdims=True)

    np.savez(
        args.output,
        labels=np.array(labels),
        pos=embed(labels),
        neg=embed(list(DEFAULT_NEGATIVES)),
    )
    print(f"wrote {args.output}: {len(labels)} prompts + {len(DEFAULT_NEGATIVES)} negatives")


if __name__ == "__main__":
    main()
