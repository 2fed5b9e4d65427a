"""Logits diff vs the HF PyTorch model (quantization accuracy check).

Reference: scripts/cal_diff.py (cosine/RMS diff vs PyTorch logits).
Usage:
  python scripts/cal_diff.py --model m.ntpu --hf_model <hf_dir> \
      --ids 3,17,91,4
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True, help=".ntpu/.gguf or HF dir")
    ap.add_argument("--hf_model", required=True, help="HF dir (fp reference)")
    ap.add_argument("--ids", default="3,17,91,4,120,5,9,33")
    args = ap.parse_args()

    import transformers
    import neural_tpu as nt
    from neural_tpu.eval.diff import compare_vs_hf

    m = nt.Model()
    if os.path.isfile(args.model):
        m.init_from_bin(args.model)
    else:
        m.init(args.model)
    hf = transformers.AutoModelForCausalLM.from_pretrained(
        args.hf_model).eval()
    ids = [int(x) for x in args.ids.split(",")]
    r = compare_vs_hf(m, hf, [ids])
    for k, v in r.items():
        if k != "per_prompt":
            print(f"{k}: {v:.6f}")


if __name__ == "__main__":
    main()
