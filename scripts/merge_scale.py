"""Merge a targeted ``bench.py --scale`` run into an existing scale
artifact: replace/add the re-swept per-query entries, then recompute
the headline ``value`` / ``max_overhead_corrected_ratio`` over the
merged set. Per-entry corrected ratios keep the overhead constant of
the run that produced them (each entry is self-consistent).

Usage: python scripts/merge_scale.py <new_run.json> <artifact.json>
"""

import json
import sys


def main() -> None:
    new_path, artifact_path = sys.argv[1], sys.argv[2]
    with open(new_path) as fh:
        new = json.load(fh)
    with open(artifact_path) as fh:
        art = json.load(fh)
    assert new["factor"] == art["factor"], (new["factor"], art["factor"])
    for name, entry in new["queries"].items():
        art["queries"][name] = entry
        # a query the new run measured successfully must not keep a
        # stale error entry from an earlier merge
        if "errors" in art:
            art["errors"].pop(name, None)
    ratios = [q["ratio"] for q in art["queries"].values() if "ratio" in q]
    corrected = [
        q["overhead_corrected_ratio"]
        for q in art["queries"].values()
        if "overhead_corrected_ratio" in q
    ]
    art["value"] = max(ratios) if ratios else None
    art["max_overhead_corrected_ratio"] = max(corrected) if corrected else None
    if new.get("errors"):
        art.setdefault("errors", {}).update(new["errors"])
    with open(artifact_path, "w") as fh:
        json.dump(art, fh, indent=1)
    print(
        f"merged {sorted(new['queries'])} into {artifact_path}: "
        f"max ratio {art['value']}, corrected {art['max_overhead_corrected_ratio']}"
    )


if __name__ == "__main__":
    main()
