"""One-click convert + quantize + generate (reference scripts/run.py:36 +
the CLI runner's flag surface, application/main_run.cpp:71-733 /
arg_parse.cpp gpt_params).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/run.py \
      --model /path/to/hf-or-gguf --weight-dtype q4_0 \
      --prompt "Once upon a time" --max-new-tokens 64

Interactive chat (reference console mode, with arch-aware ChatGLM prompt
builders):  ... --chat
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chat_console(m, args):
    """Reference interactive console (main_run.cpp interactive loop):
    multi-round chat over a persistent KV session; GLM archs get their
    [Round i] prompt format (common.cpp build_prompt_glm1/glm2)."""
    from neural_tpu.utils.prompts import build_prompt
    arch = m.cfg.arch
    history = []
    print("== neural-tpu chat (empty line or Ctrl-D to exit) ==")
    while True:
        try:
            q = input("> ").strip()
        except EOFError:
            break
        if not q:
            break
        history.append(q)
        common = dict(max_new_tokens=args.max_new_tokens,
                      do_sample=args.do_sample,
                      temperature=args.temperature, top_k=args.top_k,
                      top_p=args.top_p, kv_dtype=args.kv_dtype,
                      max_len=args.ctx_size, ignore_prompt=True)
        if arch.startswith("chatglm"):
            # GLM formats re-render the whole history each round (the
            # reference re-evals; our KV session skips the shared prefix)
            prompt = build_prompt(arch, history)
            m.reset_kv_cache()
            ids = m.tokenizer.encode(prompt)
            out = m.generate(ids, interactive=False, **common)[0]
        elif not history[:-1]:
            # first round: interactive=True creates the KV session the
            # later rounds extend
            ids = m.tokenizer.encode(q)
            out = m.generate(ids, interactive=True, **common)[0]
        else:
            ids = m.tokenizer.encode("\n" + q + "\n",
                                     add_special_tokens=False) \
                if hasattr(m.tokenizer, "encode") else m.tokenizer.encode(q)
            out = m.generate(ids, interactive=True, **common)[0]
        text = m.tokenizer.decode(out)
        history.append(text)
        print(text)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True,
                    help="HF checkpoint dir or .gguf/.ntpu file")
    ap.add_argument("--weight-dtype", default="q4_0",
                    help="quant preset (q4_0, int8, nf4, ...; 'none'=bf16)")
    ap.add_argument("--prompt", default="Once upon a time")
    ap.add_argument("--prompt-file",
                    help="file with one prompt per line → batched generate")
    ap.add_argument("--max-new-tokens", "-n", type=int, default=64)
    ap.add_argument("--ctx-size", "-c", type=int, default=None,
                    help="KV cache length (reference n_ctx)")
    ap.add_argument("--batch", "-b", type=int, default=1,
                    help="replicate --prompt into a batch of this size")
    ap.add_argument("--do-sample", action="store_true")
    ap.add_argument("--temperature", type=float, default=0.8)
    ap.add_argument("--top-k", type=int, default=40)
    ap.add_argument("--top-p", type=float, default=0.95)
    ap.add_argument("--repeat-penalty", type=float, default=1.1)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--num-beams", type=int, default=1)
    ap.add_argument("--kv-dtype", default="bf16", choices=["bf16", "int8"],
                    help="KV cache dtype (reference memory_type)")
    ap.add_argument("--streaming-llm", action="store_true",
                    help="StreamingLLM shift-RoPE infinite inference "
                    "(reference shift_roped_k)")
    ap.add_argument("--n-keep", type=int, default=4,
                    help="StreamingLLM sink tokens (reference n_keep)")
    ap.add_argument("--n-discard", type=int, default=-1,
                    help="tokens dropped per shift; -1 = half the window "
                    "(reference n_discard)")
    ap.add_argument("--chat", action="store_true",
                    help="interactive console (reference interactive mode; "
                    "ChatGLM archs get their [Round i] prompt format)")
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
    if args.chat:
        return chat_console(m, args)

    common = dict(max_new_tokens=args.max_new_tokens,
                  do_sample=args.do_sample, temperature=args.temperature,
                  top_k=args.top_k, top_p=args.top_p,
                  repetition_penalty=args.repeat_penalty,
                  num_beams=args.num_beams, seed=args.seed,
                  kv_dtype=args.kv_dtype, max_len=args.ctx_size,
                  streaming=args.streaming_llm, n_keep=args.n_keep,
                  n_discard=None if args.n_discard < 0 else args.n_discard)
    if args.prompt_file or args.batch > 1:
        if args.prompt_file:
            with open(args.prompt_file) as f:
                prompts = [ln.rstrip("\n") for ln in f if ln.strip()]
        else:
            prompts = [args.prompt] * args.batch
        rows = [m.tokenizer.encode(p) for p in prompts]
        outs = m.generate(rows, ignore_prompt=True, **common)
        for p, o in zip(prompts, outs):
            print(p + m.tokenizer.decode(o))
            print("---")
        return
    text = m.generate_text(args.prompt, session_file=args.session, **common)
    print(args.prompt + text)


if __name__ == "__main__":
    main()
