"""End-to-end demo CLI: text -> WAV with a reference voice.

Parity: reference Demo/infer.py (espeak phonemization + StyleTTS2.generate
+ soundfile write). Phonemization uses espeak-ng via the `phonemizer`
package when installed; otherwise the raw text is fed directly to the
character-level cleaner (letters are in the symbol table, so unphonemized
text still synthesizes — with reduced pronunciation quality).

Usage:
  python -m styletts2_tpu.tools.demo_infer \
      --config configs/config_example.yaml --ckpt model.ckpt \
      --ref-wav speaker.wav --text "Hello world." --out audio.wav
"""

from __future__ import annotations

import argparse


def phonemize(text: str, lang: str = "en-us") -> str:
    try:
        from phonemizer import phonemize as _ph  # pragma: no cover

        return _ph(text, language=lang, backend="espeak",
                   preserve_punctuation=True, with_stress=True)
    except Exception:
        print("styletts2_tpu: phonemizer/espeak-ng unavailable; "
              "synthesizing from raw characters")
        return text


def main(argv=None) -> None:
    from styletts2_tpu import audio as AUD
    from styletts2_tpu.infer import StyleTTS2

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--ref-wav", required=True)
    ap.add_argument("--text", required=True)
    ap.add_argument("--out", default="audio.wav")
    ap.add_argument("--speed", type=float, default=1.0)
    ap.add_argument("--denoise", type=float, default=0.3)
    ap.add_argument("--no-avg-style", action="store_true")
    ap.add_argument("--no-stabilize", action="store_true")
    ap.add_argument("--lang", default="en-us")
    args = ap.parse_args(argv)

    engine = StyleTTS2(args.config, args.ckpt)
    style = engine.get_styles({"path": args.ref_wav, "speed": args.speed},
                              denoise=args.denoise,
                              avg_style=not args.no_avg_style)
    phonemes = phonemize(args.text, args.lang)
    wav = engine.generate(phonemes, style,
                          stabilize=not args.no_stabilize)
    AUD.write_wav(args.out, wav, engine.sr)
    print(f"wrote {len(wav) / engine.sr:.2f}s of audio to {args.out}")


if __name__ == "__main__":
    main()
