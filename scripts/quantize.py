"""Quantize a converted checkpoint file → file.

Reference: scripts/quantize.py (quant_bin CLI over bestla_quantize,
quant_utils.cpp:269). Usage:
  python scripts/quantize.py --model_file m.ntpu --out_file m_q4.ntpu \
      --weight_dtype int4 --group_size 32 --alg sym --compute_dtype int8
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_file", required=True,
                    help="input GGUF/.ntpu file or HF dir")
    ap.add_argument("--out_file", required=True)
    ap.add_argument("--weight_dtype", default="int4")
    ap.add_argument("--alg", default="sym", choices=["sym", "asym"])
    ap.add_argument("--group_size", type=int, default=32)
    ap.add_argument("--scale_dtype", default="fp32",
                    choices=["fp32", "bf16"])
    ap.add_argument("--compute_dtype", default="int8",
                    choices=["int8", "bf16", "fp32"])
    ap.add_argument("--use_ggml", action="store_true")
    args = ap.parse_args()

    import neural_tpu as nt
    nt.Model.quant_model(args.model_file, args.out_file,
                         weight_dtype=args.weight_dtype, alg=args.alg,
                         group_size=args.group_size,
                         scale_dtype=args.scale_dtype,
                         compute_dtype=args.compute_dtype,
                         use_ggml=args.use_ggml)
    print(f"wrote {args.out_file}")


if __name__ == "__main__":
    main()
