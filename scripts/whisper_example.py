"""Whisper speech-to-text example.

Reference: scripts/whisper_example.py (audio_run CLI). Usage:
  python scripts/whisper_example.py --model <hf whisper dir> --audio a.wav
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True, help="HF whisper directory")
    ap.add_argument("--audio", required=True, help="16-bit PCM WAV file")
    ap.add_argument("--max_new_tokens", type=int, default=224)
    args = ap.parse_args()

    import neural_tpu as nt
    m = nt.Model().init_whisper(args.model)
    ids = m.transcribe_file(args.audio, max_new_tokens=args.max_new_tokens)
    if m.tokenizer is not None:
        print(m.tokenizer.decode(ids, skip_special_tokens=True))
    else:
        print(ids)


if __name__ == "__main__":
    main()
