"""Run generation from a converted checkpoint (gpt_params-style CLI).

Reference: scripts/inference.py → run_<arch> binary flags
(application/main_run.cpp arg_parse). Usage:
  python scripts/inference.py --model m.ntpu -p "Hello" -n 32
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", "-m", required=True,
                    help=".ntpu/.gguf file or HF dir")
    ap.add_argument("--prompt", "-p", default="Once upon a time")
    ap.add_argument("--ids", help="comma-separated token ids (skips "
                                  "tokenizer)")
    ap.add_argument("--n_predict", "-n", type=int, default=32)
    ap.add_argument("--ctx_size", "-c", type=int, default=0)
    ap.add_argument("--seed", "-s", type=int, default=0)
    ap.add_argument("--repeat_penalty", type=float, default=1.1)
    ap.add_argument("--temperature", type=float, default=0.8)
    ap.add_argument("--top_k", type=int, default=40)
    ap.add_argument("--top_p", type=float, default=0.95)
    ap.add_argument("--do_sample", action="store_true")
    ap.add_argument("--num_beams", type=int, default=1)
    ap.add_argument("--shift_roped_k", action="store_true",
                    help="StreamingLLM ring-KV infinite inference")
    ap.add_argument("--memory_dtype", default="bfloat16",
                    choices=["bfloat16", "int8", "f16", "auto"],
                    help="KV cache dtype (f16/auto map to bfloat16)")
    args = ap.parse_args()

    import neural_tpu as nt
    m = nt.Model()
    if os.path.isfile(args.model):
        m.init_from_bin(args.model)
    else:
        m.init(args.model)

    if args.ids:
        ids = [int(x) for x in args.ids.split(",")]
    else:
        assert m.tokenizer is not None, "no tokenizer; pass --ids"
        ids = m.tokenizer.encode(args.prompt)

    out = m.generate(
        [ids], max_new_tokens=args.n_predict, do_sample=args.do_sample,
        temperature=args.temperature, top_k=args.top_k, top_p=args.top_p,
        repetition_penalty=args.repeat_penalty, num_beams=args.num_beams,
        seed=args.seed, streaming=args.shift_roped_k,
        max_len=args.ctx_size or None)[0]
    if m.tokenizer is not None:
        print(m.tokenizer.decode(out))
    else:
        print(out)


if __name__ == "__main__":
    main()
