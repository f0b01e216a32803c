#!/usr/bin/env python3
"""Cross-DuckDB-build portability audit of the oracle gate (round-8
verdict item 7; key-tracing extension round 9).

Mechanism of the only cross-build failure mode ever observed (q165/q180,
rounds 6-7): a libm function (ln/exp/pow) computes an ulp differently
on the driver's DuckDB build than locally, and when the value sits close
enough to a 6dp rounding HALF boundary (x.5e-6), the driver's
round-before-hash flips a digit on one side only. Integer/DECIMAL gate
columns cannot drift; floats far from every half boundary cannot flip.

Round-9 lesson (the q180 blind spot): inspecting OUTPUT column dtypes is
not enough — a query can emit pure BIGINT columns whose values were
DERIVED through engine-evaluated float arithmetic (a `floor(double)`
group key, a float expression in a JOIN condition). Such a query
classified "INTEGER" here while its hash missed the driver's build for
three rounds. So the audit now ALSO statically traces the SQL:

  * int-from-float — `floor(`/`ceil(` anywhere in the oracle (flooring is
    only meaningful on floats; integer division is spelled `//`), or an
    explicit integer CAST wrapping float arithmetic. An all-integer
    output that uses these depends on engine floats.
  * float-key — an alias DEFINED by float arithmetic (`::DOUBLE`,
    `AS DOUBLE`, a libm call, non-`//` division) that is later referenced
    in a GROUP BY list, a USING(...) join, or an ON equality.
  * list-slice / multi-ref CTE without MATERIALIZED — dialect constructs
    with known cross-version semantics/perf drift, listed per query.

Verdict model:
  INTEGER         — all-integer outputs AND no float-derived constructs:
                    cross-build-invariant, full stop.
  MARGIN-PINNED   — all-integer outputs, float-derived (micro-unit
                    quantization), and a committed margin SPEC pins every
                    gate-corpus value off its floor boundary
                    (DsirMarginSpec / PagerankMarginSpec).
  INT-FROM-FLOAT  — all-integer outputs that depend on engine floats
                    with NO margin spec: the q180 failure shape. FAILS
                    the audit (exit 1) until quantized+pinned or made
                    pure-integer.
  MARGIN-OK       — float outputs, every value > margin (default 1e-3
                    micro-units) from a half boundary on this dataset.
  NEAR-BOUNDARY / AT-RISK — float outputs within margin (AT-RISK when a
                    libm construct is also present).

Static-trace limits (documented, deliberate): GROUP BY ordinals are
resolved only through the alias list of the same SELECT; nested
expression keys without an alias are caught by the int-from-float branch
instead. The tracer over-approximates (prefers false flags over silence).

Usage: python3 tools/oracle_portability.py <verifyOutDir> [> ORACLE_PORTABILITY.md]
"""
import json
import os
import re
import sys

import numpy as np
import pandas as pd

CONSTRUCTS = {
    "ln": r"\bln\s*\(",
    "exp": r"\bexp\s*\(",
    "pow": r"\bpow\s*\(",
    "sqrt": r"\bsqrt\s*\(",
    "log10/log2": r"\blog(10|2)?\s*\(",
    "round": r"\bround\s*\(",
    "quantile_cont": r"quantile_cont",
    "list-slice": r"\[\s*\w+[^]]*:",
    "int-from-float": r"\b(floor|ceil)\s*\(",
}
LIBM = {"ln", "exp", "pow", "log10/log2"}  # sqrt is IEEE-exact (correctly
# rounded by the standard), round() on values far from .5 is stable

# All-integer gate queries that DO derive through floats, with the
# ScalaTest margin spec that pins every gate-corpus value off its
# quantization boundary (the q165 recipe). Adding a query here without
# committing its spec case would be lying to the audit — keep in sync.
MARGIN_SPEC_PINNED = {
    "q165_dsir_select": "DsirMarginSpec",
    "q56_doc_pagerank": "PagerankMarginSpec",
    "q81_pagerank_weighted": "PagerankMarginSpec",
    "q233_hits": "PagerankMarginSpec",
    # the capstone's one genuinely build-sensitive float->int decision is
    # the mixture stage's floor(rate*10000) (pow-derived rate); the spec
    # measures it over BOTH mixture frames (raw corpus and q283's clean
    # corpus). The other float stages inherit green arguments: quality
    # centi (q282's 2dp round-trip), quality gate / jaccard compares on
    # singly-computed IEEE ratios (q41/q31's chains), winnowing/packing
    # pure integer.
    "q283_pretrain_pipeline": "GateMarginSpec (mixture rate boundary)",
    # the increment's oracle IS q283's SQL and its Spark path converges on
    # the same clean corpus (PipelineSpec law), so the same mixture-rate
    # margin measurement covers it
    "q287_pretrain_pipeline_increment": "GateMarginSpec (mixture rate "
        "boundary; oracle is q283's SQL verbatim)",
    # the funnel shares q283's chain verbatim (pretrainChainCtes); its
    # only build-sensitive float->int decision is the same mixture-stage
    # floor(rate*10000), and the mixture row is the only one the rate
    # gate can move — the same spec measurement covers it
    "q288_pretrain_funnel": "GateMarginSpec (mixture rate boundary; "
        "shares q283's pretrainChainCtes prefix)",
    # q290's oracle IS q283's SQL verbatim; its Spark path converges on the
    # same clean corpus (the parquet round-trip law) — the same mixture-rate
    # measurement covers it
    "q290_pretrain_artifact_roundtrip": "GateMarginSpec (mixture rate "
        "boundary; oracle is q283's SQL verbatim)",
    # q292's oracle IS q283's SQL verbatim; its Spark path is q290's with
    # the layer compacted between write and read, and the compaction law
    # (DeltaCompactorSpec: folded-read ≡ delta-read) converges it on the
    # same clean corpus — the same mixture-rate measurement covers it
    "q292_pretrain_layer_compaction": "GateMarginSpec (mixture rate "
        "boundary; oracle is q283's SQL verbatim)",
    # q291 runs q283's chain twice (as-of half + whole corpus); the spec
    # measures the mixture-rate boundary over BOTH frames (whole via the
    # q283 case, batch-0 half via its own case)
    "q291_pretrain_funnel_series": "GateMarginSpec (mixture rate boundary "
        "measured over both as-of frames)",
}

# All-integer gate queries whose float stage is DETERMINISTIC IEEE on
# EXACT inputs (integer counts, DECIMAL/HUGEINT sums, md5 hex pairs,
# double literals) spelled in one fixed association order on both
# engines — build-invariant by construction (IEEE ops are exactly
# rounded; only SUM-ORDER over floats or iterated normalizations can
# drift). A margin spec would be redundant: both engines compute the
# same bits, not nearby bits. Keep each justification specific; a new
# floor()-carrying query must land here (with its exactness argument)
# or in MARGIN_SPEC_PINNED (with its spec) to pass the audit.
EXACT_IEEE = {
    "q76_frame_sample": "floor on integer byte offsets only",
    "q110_neyman_sample": "allocation = floor on sqrt of exact integer "
        "counts (sqrt correctly rounded), fixed expression shape",
    "q141_k_anonymity": "floor on ratios of exact integer group counts",
    "q173_epoch_manifest": "md5 basis-point gate + floor on exact "
        "integer-count ratios",
    "q182_training_order": "same manifest arithmetic as q173",
    "q224_bradley_terry": "MM loop entirely in BIGINT micro-units; floor "
        "inputs are exact integer products",
    "q226_rank_biased_overlap": "integer prefix sums x double-literal "
        "geometric weights, one fixed chain",
    "q227_pass_at_k": "left-assoc IEEE factor chain on integer prefix "
        "counts",
    "q234_cuped": "DECIMAL(38,0)-exact moments of micro-quantized sums; "
        "theta/means are fixed chains on exact sums (q218 recipe)",
    "q241_cuped_increment": "q234's readout over the merged artifact — "
        "same exact sums, same fixed chains",
    "q238_lof_outliers": "distances quantize once via floor(sqrt(exact "
        "fixed-order fold)); every downstream step (ranks, max, sums, "
        "lrd, LOF) is pure integer arithmetic",
    "q244_lof_outliers_ivf": "q238's lattice (same exactness argument) "
        "over cell-bounded pairs; the quantizer's cell argmin compares "
        "fixed-order list_sum folds of DECIMAL-exact centroid means "
        "(deterministic IEEE bits on both engines, integer tie-break) — "
        "the q117/q108 acceptance argument",
    "q247_lof_outliers_lsh": "q238's lattice over axis-sign bucket pairs; "
        "the bucket is a sum of sign comparisons (exact) with the width "
        "from integer bit-length arithmetic — no libm anywhere",
    "q251_lof_quality": "the q238 and q247 lattices verbatim as two arms "
        "(identical distance chain, same exactness argument), then pure "
        "integer ranks/intersections/div — the only floats are the arms' "
        "already-accepted floor(sqrt(exact fold)) quantizations",
    "q235_readability": "all-integer word/sentence/syllable counts; one "
        "fixed Flesch chain",
    "q237_clip_filter": "md5 hex-pair embeddings (exact integers/256); "
        "one left-assoc cosine chain + correctly-rounded sqrt",
    "q254_lof_outliers_lsh_multi": "q247's lattice (same floor(sqrt(exact "
        "fixed-order fold)) quantization, integer bit-length widths) over "
        "the multi-table DISTINCT-union pair feed — the rotated-window "
        "signatures are still sums of exact sign comparisons, so the "
        "q247 acceptance argument transfers unchanged",
    "q253_lof_multi_quality": "the q238 and q254 lattices verbatim as "
        "arms (q251's acceptance argument over the table-count dial); "
        "downstream ranks/intersections/div pure integer",
    "q273_lof_quality_planted": "q251's acceptance argument over the "
        "planted source: the pe transform is exact or singly-rounded "
        "IEEE ops only (x0.125 exponent shift exact, +/-4.0 one "
        "correctly-rounded add, FLOAT narrowing correctly rounded, sign "
        "from integer bit tests) — identical bits on both engines feed "
        "the already-accepted lattices",
    "q274_lof_multi_quality_planted": "q253's acceptance argument over "
        "the same exact planted transform",
    "q277_hard_negatives": "q238's distance quantization verbatim "
        "(floor(sqrt(exact fixed-order fold)) once per pair); downstream "
        "is pure integer (dm, id) ranks — no float ever aggregates",
    "q279_wordpiece_train": "the argmax score is ONE double expression — "
        "CAST(c AS DOUBLE)/(CAST(a AS DOUBLE)*CAST(b AS DOUBLE)) on exact "
        "integer counts — identical bits on any IEEE engine (the ratio-"
        "quantization argument), pair-asc tie-break; only integers are "
        "emitted",
    "q280_hard_negative_recall": "q277/q278's quantize-once distances as "
        "arms; downstream pair intersections and recall div are pure "
        "integer",
    "q282_dedup_keep_best": "the keeper decision reads quality CENTI "
        "units: q20's already-2dp-rounded score survives the x100+0.5 "
        "floor round-trip exactly (the q270 micro-requantization "
        "argument — a value with <=2 decimal digits recovers its integer "
        "representation bit-for-bit on any IEEE engine); clusters/ranks "
        "downstream are pure integer, pair feed is q31's green chain",
    "q285_keep_best_increment": "q282's oracle and argument VERBATIM "
        "(the increment law's whole contract is reproducing that "
        "rebuild): quality centi round-trip exact, clusters/ranks pure "
        "integer, pair feed q31's green chain",
    "q278_hard_negatives_lsh": "q254's bucket argument (sums of exact "
        "sign comparisons, integer bit-length widths) feeding q277's "
        "quantize-once distance + integer rank tail",
    "q266_poisson_bootstrap": "per-row micro quantization is the single "
        "fixed floor(value*1e6+0.5) IEEE chain (the q234 recipe); weights "
        "are md5-derived integers through a CASE ladder; all sums "
        "HUGEINT/DECIMAL(38,0), readout pure integer division/ranks",
    "q267_bootstrap_increment": "q266's chain over shard-merged sums — "
        "same per-row quantization, same integer readout",
    "q268_trimmed_mean": "same floor(value*1e6+0.5) per-row quantization; "
        "rank, trim bounds, and both means are pure integer arithmetic "
        "on the quantized values",
    "q270_rouge_bootstrap": "the bootstrapped value is q259's integer "
        "f1_ppm (<= 1e6) round-tripped through the fixed /1e6 then "
        "*1e6+0.5 floor chain — three IEEE ops on an exact integer, "
        "recovering it bit-for-bit on both engines; weights and sums are "
        "the q266 md5/HUGEINT machinery",
}

# Float-emitting MARGIN-OK queries whose half-boundary margin is ALSO
# re-measured on the gate corpus inside `sbt test` (GateMarginSpec, the
# round-10 extension of the DsirMarginSpec recipe): the audit below is a
# snapshot of today's data, the spec makes the margin survive a data
# refresh. SINGLE SOURCE (round-10 ADVICE): the list lives in
# tools/gate_margin_narrowest.txt and is read by both this script and
# GateMarginSpec — a re-rank updates one file, both consumers follow.
with open(os.path.join(os.path.dirname(__file__),
                       "gate_margin_narrowest.txt")) as _f:
    GATE_MARGIN_SPECCED = {ln.strip() for ln in _f if ln.strip()}

FLOAT_DEF = re.compile(
    r"(?:::\s*double|as\s+double\s*\)|\b(?:ln|exp|pow|sqrt|log10|log2)\s*\("
    r"|(?<!/)/(?!/))",
    re.IGNORECASE)
ALIAS_DEF = re.compile(r"\bas\s+([a-z_][a-z0-9_]*)\s*(?:,|\n|from\b|$)",
                       re.IGNORECASE)


def float_key_aliases(sql: str):
    """Aliases defined by float arithmetic that later key a GROUP BY,
    USING(...) or ON equality. Line-scoped definition scan (oracle SQL is
    one select item per line by construction here)."""
    float_aliases = set()
    for line in sql.splitlines():
        low = line.lower()
        m = ALIAS_DEF.search(low)
        if not m:
            continue
        body = low[: m.start()]
        if FLOAT_DEF.search(body):
            float_aliases.add(m.group(1))
    if not float_aliases:
        return []
    low = sql.lower()
    hits = []
    for a in sorted(float_aliases):
        in_group = re.search(rf"group\s+by\b[^)\n]*\b{a}\b", low)
        in_using = re.search(rf"using\s*\([^)]*\b{a}\b", low)
        in_on = re.search(rf"\bon\b[^\n]*\b{a}\b\s*=|\bon\b[^\n]*=\s*[\w.]*\b{a}\b", low)
        if in_group or in_using or in_on:
            hits.append(a)
    return hits


def multi_ref_unmaterialized_ctes(sql: str):
    """CTE names referenced >= 3 times without AS MATERIALIZED — the
    exponential-inlining perf trap (q224 lesson), advisory only."""
    low = sql.lower()
    out = []
    for m in re.finditer(r"\b([a-z_][a-z0-9_]*)\s+as\s+(materialized\s+)?\(", low):
        name, materialized = m.group(1), bool(m.group(2))
        if materialized or name in ("select",):
            continue
        refs = len(re.findall(rf"\b{name}\b", low)) - 1  # minus the definition
        if refs >= 3:
            out.append(name)
    return out


def half_boundary_margin(df: pd.DataFrame):
    worst = None
    for c in df.columns:
        if not pd.api.types.is_float_dtype(df[c]):
            continue
        v = df[c].dropna().to_numpy(dtype=float)
        v = v[np.isfinite(v)] * 1e6
        if len(v) == 0:
            continue
        frac = np.abs(v - np.floor(v))
        d = float(np.min(np.abs(frac - 0.5)))
        if worst is None or d < worst[1]:
            worst = (c, d)
    return worst  # None when the query has no float columns


def main(out_dir: str, margin: float = 1e-3) -> int:
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    rows = []
    for name, sql in sorted(oracles.items()):
        s = sql.lower()
        used = [k for k, p in CONSTRUCTS.items() if re.search(p, s)]
        fkeys = float_key_aliases(sql)
        if fkeys:
            used.append("float-key(" + ",".join(fkeys) + ")")
        mctes = multi_ref_unmaterialized_ctes(sql)
        if mctes:
            used.append("multi-ref-cte(" + ",".join(mctes) + ")")
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:  # noqa: BLE001
            rows.append((name, used, "NO-DUMP", str(e)))
            continue
        w = half_boundary_margin(got)
        if w is None:
            float_derived = ("int-from-float" in used) or fkeys \
                or bool(set(used) & LIBM)
            if not float_derived:
                rows.append((name, used, "INTEGER",
                             "no float gate columns, no float-derived keys"))
            elif name in MARGIN_SPEC_PINNED:
                rows.append((name, used, "MARGIN-PINNED",
                             f"integer outputs derive through floats; "
                             f"{MARGIN_SPEC_PINNED[name]} pins gate-corpus "
                             f"values off the quantization boundary"))
            elif name in EXACT_IEEE:
                rows.append((name, used, "EXACT-IEEE",
                             f"deterministic IEEE on exact inputs: "
                             f"{EXACT_IEEE[name]}"))
            else:
                rows.append((name, used, "INT-FROM-FLOAT",
                             "integer outputs DEPEND on engine-evaluated "
                             "floats with no margin spec — the q180 shape"))
        elif w[1] > margin:
            pinned = ("; GateMarginSpec re-measures on refresh"
                      if name in GATE_MARGIN_SPECCED else "")
            rows.append((name, used, "MARGIN-OK",
                         f"min half-boundary distance {w[1]:.3g} micro "
                         f"(col {w[0]}){pinned}"))
        else:
            libm = sorted(set(used) & LIBM)
            sev = "AT-RISK" if libm else "NEAR-BOUNDARY(no-libm)"
            rows.append((name, used, sev,
                         f"col {w[0]} within {w[1]:.3g} micro of a half "
                         f"boundary; libm={libm or 'none'}"))
    print("# ORACLE PORTABILITY — cross-DuckDB-build audit")
    print()
    print("Generated by tools/oracle_portability.py over the committed Verify")
    print("dump at the gate SF. See the module docstring for the failure-mode")
    print("model and the round-9 key-tracing extension (float-derived GROUP")
    print("BY/JOIN keys and dialect constructs are flagged per query, not")
    print("just gate-column dtypes — the q180 blind-spot fix).")
    print()
    print("Verdict classes for all-integer outputs that touch floats:")
    print("MARGIN-PINNED = order-sensitive float sums, a committed margin")
    print("spec pins gate-corpus values off the quantization boundary;")
    print("EXACT-IEEE = the float stage is deterministic IEEE on EXACT")
    print("inputs in one fixed association order (both engines compute the")
    print("same bits, not nearby bits — a margin spec would be redundant);")
    print("INT-FROM-FLOAT = neither argument on file: FAILS the audit.")
    print("`list-slice` notes: DuckDB 1-based inclusive slicing survives only")
    print("in green all-integer-candidate queries; new oracles spell bands as")
    print("explicit elements. `sqrt` is IEEE-correctly-rounded (never")
    print("build-dependent); `quantile_cont` interpolation runs on")
    print("integer/exact inputs in every query that uses it, and its outputs")
    print("route through the same float-margin measurement as everything")
    print("else.")
    print()
    counts = {}
    for _, _, v, _ in rows:
        counts[v] = counts.get(v, 0) + 1
    print("Verdicts:", ", ".join(f"{k}={v}" for k, v in sorted(counts.items())))
    print()
    print("| query | constructs | verdict | evidence |")
    print("|---|---|---|---|")
    for name, used, verdict, why in rows:
        print(f"| {name} | {', '.join(used) or '—'} | {verdict} | {why} |")
    bad = [r for r in rows if r[2] in ("AT-RISK", "NO-DUMP", "INT-FROM-FLOAT")]
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
