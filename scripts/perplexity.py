"""Sliding-window perplexity over a text file or token file.

Reference: scripts/perplexity.py:58 (wikitext-2 sliding-window PPL).
Usage:
  python scripts/perplexity.py --model m.ntpu --text wiki.txt \
      --ctx_size 256 --stride 128
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--text", help="plain text file")
    ap.add_argument("--ids", help=".npy int32 token file")
    ap.add_argument("--ctx_size", type=int, default=256)
    ap.add_argument("--stride", type=int, default=0,
                    help="window stride (default ctx_size/2)")
    args = ap.parse_args()

    import numpy as np
    import neural_tpu as nt
    from neural_tpu.eval.perplexity import perplexity

    m = nt.Model()
    if os.path.isfile(args.model):
        m.init_from_bin(args.model)
    else:
        m.init(args.model)
    if args.ids:
        ids = np.load(args.ids).astype(np.int32).tolist()
    else:
        assert m.tokenizer is not None, "no tokenizer; pass --ids"
        ids = m.tokenizer.encode(open(args.text).read())
    r = perplexity(m.params, m.cfg, ids, ctx_size=args.ctx_size,
                   stride=args.stride or None)
    print(f"perplexity: {r['ppl']:.4f} over {r['n_tokens']} tokens "
          f"(ctx {args.ctx_size})")


if __name__ == "__main__":
    main()
