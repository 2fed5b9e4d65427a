"""One-click convert + quantize + generate (reference scripts/run.py:36).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/run.py \
      --model /path/to/hf-or-gguf --weight-dtype q4_0 \
      --prompt "Once upon a time" --max-new-tokens 64
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True,
                    help="HF checkpoint dir or .gguf/.ntpu file")
    ap.add_argument("--weight-dtype", default="q4_0",
                    help="quant preset (q4_0, int8, nf4, ...; 'none'=bf16)")
    ap.add_argument("--prompt", default="Once upon a time")
    ap.add_argument("--max-new-tokens", type=int, default=64)
    ap.add_argument("--do-sample", action="store_true")
    ap.add_argument("--temperature", type=float, default=0.8)
    ap.add_argument("--top-k", type=int, default=40)
    ap.add_argument("--top-p", type=float, default=0.95)
    ap.add_argument("--num-beams", type=int, default=1)
    ap.add_argument("--streaming-llm", action="store_true",
                    help="StreamingLLM shift-RoPE infinite inference")
    ap.add_argument("--save", help="save converted model to .ntpu")
    ap.add_argument("--session", help="prompt-keyed KV session file "
                    "(reference --session: reuse matching prompt prefix)")
    args = ap.parse_args()

    import neural_tpu as nt
    m = nt.Model()
    if os.path.isfile(args.model):
        m.init_from_bin(args.model)
    else:
        wd = None if args.weight_dtype == "none" else args.weight_dtype
        m.init(args.model, weight_dtype=wd)
    if args.save:
        m.save(args.save)
        print(f"saved to {args.save}")
    text = m.generate_text(args.prompt, max_new_tokens=args.max_new_tokens,
                           do_sample=args.do_sample,
                           temperature=args.temperature, top_k=args.top_k,
                           top_p=args.top_p, num_beams=args.num_beams,
                           streaming=args.streaming_llm,
                           session_file=args.session)
    print(args.prompt + text)


if __name__ == "__main__":
    main()
