#!/usr/bin/env python
"""Merge a demo_closed_loop/demo_qlora_finetune output JSON into the
repo's evidence artifacts (E2E_CLOSED_LOOP.json / E2E_QLORA.json) under
a named key, preserving everything else.

  python scripts/merge_e2e_entry.py --src /tmp/opz_scaleup/scaleup_full.json \
      --dst E2E_CLOSED_LOOP.json --key scale_up_reach [--extra k=v ...]
"""

from __future__ import annotations

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True)
    ap.add_argument("--dst", required=True)
    ap.add_argument("--key", default=None,
                    help="entry key in dst (omit = replace dst root, the "
                         "E2E_QLORA.json layout)")
    ap.add_argument("--extra", nargs="*", default=[],
                    help="extra k=v string fields to annotate the entry")
    args = ap.parse_args()

    with open(args.src) as f:
        entry = json.load(f)
    for kv in args.extra:
        k, v = kv.split("=", 1)
        entry[k] = v

    if args.key is None:
        merged = entry
    else:
        try:
            with open(args.dst) as f:
                merged = json.load(f)
        except FileNotFoundError:
            merged = {}
        merged[args.key] = entry

    with open(args.dst, "w") as f:
        json.dump(merged, f, indent=1)
    print(f"merged {args.src} -> {args.dst}" +
          (f"[{args.key}]" if args.key else ""))


if __name__ == "__main__":
    main()
