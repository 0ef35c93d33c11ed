"""Assemble benchmarks/results_r5.json from the round-5 measurement
artifacts (each produced by its own script on the real chip):

- ``.equiv_<config>.json``   engine-equivalence study shards
  (benchmarks/engine_equivalence.py --configs <config>), merged into
  one study dict + written whole to results_engine_equiv.json
- ``.admm_scale.json``       ADMM-family at-scale rows
  (benchmarks/admm_scale.py | tail -1)
- ``.capacity.json``         capacity probe rows (benchmarks/capacity_bf16.py)
- ``.compile_cliff.json``    weighted-adaprox first-call decomposition
  (written by the round-5 probe, see docs/BENCHMARKS.md "Compile
  behavior")

Usage: python benchmarks/assemble_r5.py
"""

import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))


def _load(name):
    p = os.path.join(HERE, name)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def main():
    out = {}

    shards = {}
    for fn in sorted(os.listdir(HERE)):
        if fn.startswith(".equiv_") and fn.endswith(".json"):
            shards[fn[len(".equiv_"):-len(".json")]] = _load(fn)
    if shards:
        merged = {"seeds": None, "acceptance": None, "configs": {},
                  "wall_s": 0.0}
        for name, sh in shards.items():
            # the merged study reports ONE seeds/acceptance provenance —
            # refuse to silently mix shards produced under different
            # --seeds or acceptance constants
            for field in ("seeds", "acceptance"):
                if (merged[field] is not None
                        and merged[field] != sh[field]):
                    raise SystemExit(
                        f"shard {name!r} was produced with {field}="
                        f"{sh[field]!r} but an earlier shard used "
                        f"{merged[field]!r}; re-run the stale shard "
                        f"before assembling")
            merged["seeds"] = sh["seeds"]
            merged["acceptance"] = sh["acceptance"]
            merged["configs"].update(sh["configs"])
            merged["wall_s"] += sh.get("wall_s", 0.0)
        merged["all_ok"] = all(c["all_ok"]
                               for c in merged["configs"].values())
        with open(os.path.join(HERE, "results_engine_equiv.json"),
                  "w") as f:
            json.dump(merged, f)
        # results_r5 carries the summary (stats + verdicts), not the
        # per-seed rows — those live in results_engine_equiv.json
        out["engine_equivalence"] = {
            "seeds": merged["seeds"],
            "acceptance": merged["acceptance"],
            "all_ok": merged["all_ok"],
            "wall_s": round(merged["wall_s"], 1),
            "configs": {
                name: {
                    "problem": c["problem"],
                    "stats": c["stats"],
                    "verdicts": c["verdicts"],
                    "all_ok": c["all_ok"],
                }
                for name, c in merged["configs"].items()
            },
        }

    for key, fn in (("admm_scale", ".admm_scale.json"),
                    ("capacity", ".capacity.json"),
                    ("compile_cliff", ".compile_cliff.json"),
                    ("flagship", ".flagship.json")):
        v = _load(fn)
        if v is not None:
            out[key] = v

    dst = os.path.join(HERE, "results_r5.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {dst}: sections {sorted(out)}")


if __name__ == "__main__":
    main()
