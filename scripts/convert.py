"""Convert an HF checkpoint to a native .ntpu (or .gguf) file.

Reference: scripts/convert.py → neural_speed.convert.convert_model
(convert/__init__.py:33). Usage:
  python scripts/convert.py --outtype q4_0 --outfile out.ntpu <hf_dir>
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model", help="HF checkpoint directory")
    ap.add_argument("--outfile", required=True, help=".ntpu or .gguf path")
    ap.add_argument("--outtype", default="f32",
                    help="f32/bf16 (no quant) or a preset (q4_0, int8, ...)")
    ap.add_argument("--model_hub", default="huggingface")
    args = ap.parse_args()

    import neural_tpu as nt
    if args.outfile.endswith(".gguf"):
        import transformers
        from neural_tpu.convert.gguf_models import export_gguf, GGML_Q4_0, \
            GGML_F32
        model = transformers.AutoModelForCausalLM.from_pretrained(args.model)
        t = GGML_F32 if args.outtype in ("f32", "bf16") else GGML_Q4_0
        export_gguf(model, args.outfile, t)
    else:
        wd = None if args.outtype in ("f32", "bf16") else args.outtype
        m = nt.Model().init(args.model, weight_dtype=wd,
                            dtype="bfloat16" if args.outtype == "bf16"
                            else "float32" if args.outtype == "f32"
                            else "bfloat16",
                            model_hub=args.model_hub)
        m.save(args.outfile)
    print(f"wrote {args.outfile}")


if __name__ == "__main__":
    main()
