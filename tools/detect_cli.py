"""Interactive / batch detection CLI — the analogue of the reference's
console app (``app/App.kt:29-170``).

Usage:
  echo "bonjour le monde" | python tools/detect_cli.py
  python tools/detect_cli.py --languages en,de,fr --confidence < texts.txt
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--languages", help="comma-separated ISO 639-1 subset")
    ap.add_argument("--low-accuracy", action="store_true")
    ap.add_argument("--confidence", action="store_true",
                    help="print top-5 confidence values")
    ap.add_argument("--multi", action="store_true",
                    help="split mixed-language lines into per-language "
                         "sections (terminal analogue of the reference's "
                         "multi-language GUI, app/multilanguage/"
                         "MultiLanguageGui.kt)")
    ap.add_argument("--min-distance", type=float, default=0.0)
    args = ap.parse_args()

    from lingua_ray import constants as C
    from lingua_ray.api import LanguageDetectorBuilder
    if args.languages:
        codes = args.languages.split(",")
        unknown = [c for c in codes if c.lower() not in C.ISO1_INDEX]
        if unknown:
            ap.error(f"unknown ISO 639-1 code(s): {', '.join(unknown)}")
        try:
            builder = LanguageDetectorBuilder.from_iso_codes_639_1(*codes)
        except ValueError as e:                      # fewer than 2 languages
            ap.error(str(e))
    else:
        builder = LanguageDetectorBuilder.from_all_languages()
    try:
        builder = builder.with_minimum_relative_distance(args.min_distance)
        if args.low_accuracy:
            builder = builder.with_low_accuracy_mode()
        det = builder.build()
    except ValueError as e:          # e.g. <2 languages, distance ∉ [0, 0.99]
        ap.error(str(e))

    interactive = sys.stdin.isatty()
    if interactive:
        print("Type a sentence per line (ctrl-d to exit):")
    for line in sys.stdin:
        text = line.rstrip("\n")
        if not text:
            continue
        if args.multi:
            sections = det.detect_multi_language_of(text)

            def code(i):
                return C.ISO1_CODES[i] if i < len(C.ISO1_CODES) else "un"
            print(" | ".join(
                f"{code(s.language)}"
                f"[{s.start}:{s.end}]:{s.section_text.strip()!r}"
                for s in sections) or "un")
        elif args.confidence:
            values = det.compute_language_confidence_values(text)[:5]
            print(" ".join(f"{c}:{v:.4f}" for c, v in values) or "un")
        else:
            print(det.detect_language_of(text))


if __name__ == "__main__":
    main()
