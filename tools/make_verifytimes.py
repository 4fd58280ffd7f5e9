#!/usr/bin/env python3
"""Compose VERIFYTIMES_r{N}.json from two Verify runs' verify_times.json
(one per SF) and print the top-20 cross-round delta table against the
previous round's artifact (VERDICT r16 #5).

  python3 tools/make_verifytimes.py 17 target/vt001/verify_times.json \
      target/vt01/verify_times.json VERIFYTIMES_r16.json
"""
import json
import sys


def main() -> None:
    rnd, p001, p01, prev_path = sys.argv[1:5]
    t001 = json.load(open(p001))["times"]
    t01 = json.load(open(p01))["times"]
    out = {
        "round": int(rnd),
        "note": ("per-query Verify wall seconds (VERDICT r15 #4); cold "
                 "chains, one shared local[8] session per SF, includes "
                 "coalesce(1) parquet write"),
        "sf0.01": t001,
        "sf0.1": t01,
    }
    path = f"VERIFYTIMES_r{rnd}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=0)
        f.write("\n")
    print(f"wrote {path}: {len(t001)} + {len(t01)} entries")

    prev = json.load(open(prev_path))
    for sf in ("sf0.01", "sf0.1"):
        cur, old = out[sf], prev.get(sf, {})
        rows = [(k, v, old.get(k)) for k, v in cur.items()]
        rows.sort(key=lambda r: -r[1])
        print(f"\ntop-20 {sf} (cur s, prev s, delta%):")
        for k, v, o in rows[:20]:
            d = ("" if o is None or o == 0
                 else f"{(v - o) / o * 100:+6.1f}%")
            po = "" if o is None else f"{o:7.2f}"
            print(f"  {k:35s} {v:7.2f} {po:>7s} {d}")


if __name__ == "__main__":
    main()
