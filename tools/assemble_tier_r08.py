"""Assemble docs/SCALE_TIER_r08.json from the decade measurement JSONs.

Inputs (written by tools/sf_tier_compare.py runs this round):
  /tmp/tier_r8_d1.json   — sf0.1  -> sf1.0  (12 changed queries)
  /tmp/tier_r8_d2.json   — sf1.0  -> sf10   (same 12)
  /tmp/tier_r8_d3c.json  — sf10   -> sf100  (corpus-only subset; the d3/d3b
                           runs were stopped/killed partway — their rows are
                           recovered in D3_RECOVERED below). If d3c is
                           missing, the recovered rows are used alone and the
                           output is stamped third_decade_inputs="recovered
                           stderr rows only" plus a stderr warning.

Usage: python tools/assemble_tier_r08.py
"""

from __future__ import annotations

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

NOTES: dict[str, dict[str, str]] = {
    # decade -> query -> note (attached to the row verbatim)
    "first_decade": {
        "contamination_check": "exponent tracks output growth (20 -> 87 rows); the probe itself is the bounded broadcast gram join",
        "dedup_semantic_sampled": "output-proportional: k = n/64 grows the cluster listing 10x per decade by design",
    },
    "second_decade": {},
    "third_decade": {},
}


def load(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def rows(report: dict, decade: str) -> dict:
    out = {}
    for name, row in sorted(report.items()):
        r = dict(row)
        note = NOTES.get(decade, {}).get(name)
        if note:
            r["note"] = note
        out[name] = r
    return out


#: Third-decade rows recovered from the stderr lines of measurement runs
#: that were split across invocations (the first run was stopped after
#: dedup_fuzzy_edit to drop dedup_simhash_verified — it shares
#: simhash_wide_near_pairs with fuzzy_edit, pair sets within 0.3% at both
#: lower decades — and the second died on the cascade's old 600s hang
#: guard, fixed in the same session).
D3_RECOVERED: dict[str, dict] = {
    "dedup_fuzzy_edit": {
        "sec": {"sf10.0": 134.79, "sf100.0": 1747.95},
        "out_rows": {"sf10.0": 4748, "sf100.0": 46526},
        "runtime_exponent": 1.113,
        "output_exponent": 0.991,
        "note": "r07 CEILING FIXED: the 24-bit band-triple run GC-thrashed a 64g driver at this tier; the 128-bit half-split design completes in 29 min with runtime growth ~ output growth (13.0x vs 9.8x). The residual over-linearity is the 2^33-keyspace chance-collision mass (~140*n^2/2^33 ~ 4*10^5 pairs at 5M docs), all killed by the Hamming verify",
    },
    "dedup_simhash_verified": {
        "status": "covered by dedup_fuzzy_edit",
        "note": "shares simhash_wide_near_pairs/_sig_banded_pairs with dedup_fuzzy_edit (pair sets within 0.3% at sf1.0 and sf10); its third-decade behavior is the same measured path",
    },
    "fuzzy_blocking_recall": {
        "sec": {"sf10.0": 8.58, "sf100.0": 12.45},
        "out_rows": {"sf10.0": 1, "sf100.0": 1},
        "runtime_exponent": 0.162,
        "output_exponent": 0.0,
    },
    "curation_pipeline_e2e": {
        "sec": {"sf10.0": 431.61, "sf100.0": 1318.76},
        "out_rows": {"sf10.0": 5, "sf100.0": 5},
        "runtime_exponent": 0.485,
        "output_exponent": 0.0,
        "note": "r07 CEILING FIXED: stage-3 MinHash banding saturated the ~30k shingle keyspace at 5M docs; the corpus-size-adaptive ladder ((14,8) rung at this tier) completes sublinearly",
    },
}


def main() -> None:
    import sys

    d1 = load("/tmp/tier_r8_d1.json")
    d2 = load("/tmp/tier_r8_d2.json")
    try:
        d3 = load("/tmp/tier_r8_d3c.json")
        d3_inputs = "live /tmp/tier_r8_d3c.json + recovered stderr rows from the stopped d3/d3b runs"
    except (OSError, json.JSONDecodeError):
        d3 = {"report": {}}
        d3_inputs = "recovered stderr rows only (/tmp/tier_r8_d3c.json missing)"
        print(
            "WARNING: /tmp/tier_r8_d3c.json not found — third decade is the "
            "hardcoded D3_RECOVERED rows, no live measurement data",
            file=sys.stderr,
        )
    d3["report"] = {**D3_RECOVERED, **d3["report"]}
    doc = {
        "round": 8,
        "tiers": {
            "first_decade": "sf0.1 -> sf1.0 (/root/testdata/sf0.1 vs build_sf1 --mult 10)",
            "second_decade": "sf1.0 -> sf10 (build_sf1 --mult 100: 60M lineitem / 500k docs / 200k vecs, 1.6 GB)",
            "third_decade": "sf10 -> sf100 (build_sf1 --mult 1000 --tables documents,embeddings: corpus-only, 5M docs / 2M vectors)",
        },
        "queries_measured": "every query whose semantics or plan changed in round 8: the 128-bit wide-SimHash family (dedup_fuzzy_edit, dedup_simhash_verified, fuzzy_blocking_recall), the adaptive-banding cascade (curation_pipeline_e2e, streaming_curation_cascade), the bounded _CONTAM batch (contamination_check, eval_contamination_13gram, eval_decontamination_neardup, contamination_span_stats, streaming_decontamination_gate), and the new sampled-fit SemDeDup pair (dedup_semantic_sampled, semantic_blocking_recall_sampled)",
        "first_decade": rows(d1["report"], "first_decade"),
        "second_decade": rows(d2["report"], "second_decade"),
        "third_decade": rows(d3["report"], "third_decade"),
        "third_decade_method": "sf10 (mult=100, full) -> sf100 (mult=1000, corpus-only partial tier), best-of-1 (the fuzzy-family sf100 legs run ~30 min each; lower decades are best-of-2), SPARK_GRAFT_DRIVER_MEM=64g (the 24g clamp GC-thrashes at this tier; one JVM simulates 32 executors' heaps)",
        "third_decade_inputs": d3_inputs,
    }
    out = os.path.join(REPO, "docs", "SCALE_TIER_r08.json")
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
