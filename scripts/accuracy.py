"""Task accuracy via the lm-eval harness adapter.

Reference: scripts/accuracy.py → ns_evaluator.py:53 (lm-eval integration).
Requires the optional lm-eval package; without it, use
neural_tpu.eval.harness.loglikelihood / score_choices directly.
Usage:
  python scripts/accuracy.py --model m.ntpu --tasks lambada_openai,piqa
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--tasks", default="lambada_openai")
    ap.add_argument("--batch_size", type=int, default=1)
    ap.add_argument("--limit", type=int, default=None)
    args = ap.parse_args()

    import neural_tpu as nt
    from neural_tpu.eval.harness import make_lm_eval_model

    m = nt.Model()
    if os.path.isfile(args.model):
        m.init_from_bin(args.model)
    else:
        m.init(args.model)
    lm = make_lm_eval_model(m, batch_size=args.batch_size)
    import lm_eval
    res = lm_eval.simple_evaluate(model=lm, tasks=args.tasks.split(","),
                                  limit=args.limit)
    print(res["results"])


if __name__ == "__main__":
    main()
