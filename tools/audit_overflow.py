"""Mechanical int64-overflow audit over the whole query registry.

Four rounds running, an ANSI ARITHMETIC_OVERFLOW was found late — q118
(PMI ratio, r5), q198 (ppm product, r5), q203 (power iteration, r6),
q214 (OLS sum of y*y, crashed the round-6 bench) — each time with a
docstring whose prose "proved" int64 safety while missing one term.
This tool replaces the prose audit with two mechanical gates:

1. ``--static``: walk every registered query's OPTIMIZED Spark plan and
   extract each ``sum(<expr>)`` whose argument multiplies integer
   columns without decimal/double promotion — the volume-growing
   overflow class (a per-row-bounded product whose SUM crosses 2^63
   purely through corpus growth). Every such site must appear in
   ``tools/overflow_allowlist.json`` with a written per-row bound and
   the corpus size at which it would cross 2^63; an unlisted site fails
   the audit (rc=1). Expressions are normalized (attribute ids
   stripped) so the allowlist is stable across plan re-derivations.

2. ``--stress [DIR]``: build a deterministic worst-case-magnitude
   corpus (every numeric column pinned to its max |value| observed in
   the base tables, volume multiplied) and run EVERY registered query
   against it with per-query fault isolation. This catches the per-row
   domain-overflow class (q233: 1e6*dist2 at the coordinate bound) that
   no SUM-site walk can see, at >= the scale the round bench runs.
   Any ARITHMETIC_OVERFLOW / CAST_OVERFLOW is a failure; other errors
   are reported (stress rows break some queries' semantic assumptions,
   e.g. divide-by-zero guards are still honest failures to look at).

Usage:
    python tools/audit_overflow.py --static
    python tools/audit_overflow.py --static --emit tools/overflow_allowlist.json
    python tools/audit_overflow.py --stress [/tmp/stress_corpus] [--mult 32]
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ALLOWLIST_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "overflow_allowlist.json")
SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.001")

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


# ---------------------------------------------------------------------------
# Static walk


def _balanced(s: str, start: int) -> str:
    """Return the balanced-paren argument starting at s[start] == '('."""
    depth = 0
    for i in range(start, len(s)):
        if s[i] == "(":
            depth += 1
        elif s[i] == ")":
            depth -= 1
            if depth == 0:
                return s[start + 1 : i]
    return s[start + 1 :]


def normalize(expr: str) -> str:
    """Strip attribute ids/exprIds and collapse big literals so a site is
    stable across analyses AND across generated per-replicate constants
    (q232's 16 salted replicas normalize to ONE allowlist entry)."""
    e = re.sub(r"#\d+[A-Za-z]*", "", expr)
    e = re.sub(r"\b\d{4,}\b", "N", e)
    # WithCTE/common-subexpression aliases embed a per-analysis counter
    # in the NAME (_common_expr_11 vs _common_expr_28 for the same
    # expression in different sessions) — canonicalize it or the
    # allowlist key churns with the exprId allocator.
    e = re.sub(r"\b_common_expr_\d+\b", "_common_expr_N", e)
    e = re.sub(r"\s+", " ", e).strip()
    return e


def _strip_parens(s: str) -> str:
    s = s.strip()
    while s.startswith("(") and s.endswith(")") and _balanced(s, 0) == s[1:-1]:
        s = s[1:-1].strip()
    return s


def _split_top(s: str, ops: tuple[str, ...]) -> list[str]:
    """Split on any of the operator tokens at paren depth 0."""
    parts: list[str] = []
    depth = start = i = 0
    while i < len(s):
        c = s[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0:
            hit = next((op for op in ops if s.startswith(op, i)), None)
            if hit:
                parts.append(s[start:i])
                i += len(hit)
                start = i
                continue
        i += 1
    parts.append(s[start:])
    return [p.strip() for p in parts]


def _unwrap_cast(t: str) -> tuple[str, str] | None:
    """If t is exactly ``cast(<expr> as <type>)``, return (expr, type)
    — matched paren-balanced (a naive regex mis-splits
    ``cast(a as bigint) * cast(b as bigint)``)."""
    if not t.lower().startswith("cast("):
        return None
    inner = _balanced(t, 4)
    if len("cast(") + len(inner) + 1 != len(t):
        return None
    depth = 0
    pos = -1
    for i, c in enumerate(inner):
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0 and inner[i : i + 4] == " as ":
            pos = i
    if pos < 0:
        return None
    return inner[:pos].strip(), inner[pos + 4 :].strip()


INT_TYPES = ("bigint", "long", "int", "smallint", "tinyint")


def _expr_is_long(expr: str) -> bool:
    """Recursive integer-typedness of a plan expression: does its VALUE
    run in int-family arithmetic (so a SUM over it accumulates int64)?
    Replaces the r1–r7 whole-argument substring check, whose
    false-negative class the r7 advisory named: a decimal/double marker
    ANYWHERE in the argument suppressed the flag, so
    ``sum(a#L * b#L + cast(cast(c as decimal(10,0)) as bigint))`` — a
    long-accumulating sum with an unpromoted long product — was never
    audited. Typing is per node: casts type as their TARGET, compound
    arithmetic types from its operands, markers only suppress the leaf
    they actually promote."""
    t = _strip_parens(expr)
    c = _unwrap_cast(t)
    if c:
        return c[1].split("(")[0].strip().lower() in INT_TYPES
    # FLOOR/CEIL return BIGINT in Spark SQL whatever runs inside — a
    # promotion marker INSIDE the call (the q243 fixed point
    # FLOOR(ln(cast(x as double))*1e6 + 0.5)) must not suppress the
    # long typing of the RESULT (found as a live false negative the
    # day the per-node typing landed).
    m = re.match(r"(floor|ceil|ceiling)\(", t, flags=re.IGNORECASE)
    if m and len(m.group(0)) + len(_balanced(t, len(m.group(0)) - 1)) + 1 == len(t):
        return True
    low = t.lower()
    sub = _split_top(t, (" + ", " - ", " * ", " div "))
    if len(sub) > 1:
        # Spark coerces all operands of an arithmetic node to one type
        return all(_expr_is_long(s) for s in sub)
    if "decimal" in low or "as double" in low or "todouble" in low:
        return False
    if re.fullmatch(r"\w+#\d+L", t):
        return True  # long attr
    if re.fullmatch(r"-?\d+", t) or t == "N":
        return True  # integer literal
    if re.fullmatch(r"\w+#\d+[A-Za-z]*", t):
        return False  # typed attr without L suffix (int/double/decimal)
    # unknown shape with no promotion marker (function call, CASE, ...):
    # the result type is NOT derivable from attr suffixes inside it —
    # shiftleft(1, 16 - rn#7) returns the base's long type though rn is
    # int, CASE WHEN (i#3 = j#4) THEN 1 ELSE 2 types from its branches
    # not its predicate attrs — so err toward the int-family class and
    # let the allowlist review, not the parser, clear the site.
    return True


def _is_int_product(arg: str) -> bool:
    """The volume-growing int64-overflow class: the sum ACCUMULATES in
    int-family arithmetic (arg types long, so the buffer is int64) and
    the per-row value is product-scale (a multiplication involving at
    least one attribute appears in the argument). Promoted accumulation
    (decimal/double arg) is volume-safe whatever runs inside — interior
    unpromoted products there are the per-row class the --stress gate
    covers."""
    if " * " not in arg or not re.search(r"#\d+", arg):
        return False
    return _expr_is_long(arg)


def sum_product_sites(plan: str) -> list[str]:
    """All sum(<arg>) args that multiply LONG values with no
    decimal/double promotion anywhere in the argument expression — the
    volume-growing int64-overflow class. The optimizer extracts window
    (and some aggregate) expressions into projected aliases
    (``(v * v) AS _w0#5L`` … ``sum(_w0#5L)``), so when a sum's argument
    is a bare attribute reference, one level of projection aliases is
    resolved before classifying."""
    # alias bindings: "(<expr>) AS name#idL" from Project/Aggregate nodes
    bindings: dict[str, str] = {}
    for m in re.finditer(r"\(", plan):
        expr = "(" + _balanced(plan, m.start()) + ")"
        tail = plan[m.start() + len(expr):]
        am = re.match(r" AS (\w+#\d+L)\b", tail)
        if am:
            bindings[am.group(1)] = expr
    sites = []
    for m in re.finditer(r"\bsum\(", plan):
        arg = _balanced(plan, m.end() - 1)
        ref = re.fullmatch(r"\s*(\w+#\d+L)\s*", arg)
        if ref and ref.group(1) in bindings:
            arg = bindings[ref.group(1)]
        if _is_int_product(arg):
            sites.append(normalize(arg))
    return sorted(set(sites))


def collect_sites() -> dict[str, list[str]]:
    from retail_sales_etl_pipeline_spark.plans.registry import load_all
    from retail_sales_etl_pipeline_spark.session import get_spark

    spark = get_spark("overflow-audit", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    out: dict[str, list[str]] = {}
    for name, q in sorted(registry.items()):
        try:
            df = q.spark_fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().optimizedPlan().toString()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: PLAN ERROR {str(e).splitlines()[0][:120]}",
                  file=sys.stderr)
            continue
        sites = sum_product_sites(plan)
        if sites:
            out[name] = sites
    return out


def run_static(emit: str | None) -> int:
    sites = collect_sites()
    if emit:
        # Seed/refresh the allowlist skeleton: every site gets a TODO
        # bound that a human must replace with an actual per-row bound +
        # crossing corpus size. Existing justifications are preserved.
        old: dict = {}
        if os.path.exists(ALLOWLIST_PATH):
            with open(ALLOWLIST_PATH) as f:
                old = json.load(f)
        merged = {
            q: {s: old.get(q, {}).get(s, "TODO: document per-row bound")
                for s in ss}
            for q, ss in sorted(sites.items())
        }
        with open(emit, "w") as f:
            json.dump(merged, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"wrote {emit}: {sum(len(v) for v in sites.values())} sites "
              f"across {len(sites)} queries")
        return 0

    allow: dict = {}
    if os.path.exists(ALLOWLIST_PATH):
        with open(ALLOWLIST_PATH) as f:
            allow = json.load(f)
    rc = 0
    n_sites = 0
    for qname, ss in sorted(sites.items()):
        for s in ss:
            n_sites += 1
            just = allow.get(qname, {}).get(s)
            if not just or just.startswith("TODO"):
                rc = 1
                print(f"UNJUSTIFIED {qname}: sum({s})")
    # stale allowlist entries (query/site no longer in any plan) are an
    # error too — a bound documented for code that changed is no bound.
    for qname, entries in sorted(allow.items()):
        for s in entries:
            if s not in sites.get(qname, []):
                rc = 1
                print(f"STALE ALLOWLIST {qname}: sum({s})")
    print(f"static audit: {n_sites} sum-of-int-product sites across "
          f"{len(sites)} queries -> {'GREEN' if rc == 0 else 'RED'}")
    return rc


# ---------------------------------------------------------------------------
# Max-magnitude stress corpus


KEY_COLS = ("doc_id", "vec_id", "event_id", "user_id")
KEY_OFFSET = 10**12  # replica key offset: far above any real id, well under 2^63


def build_stress(spark, out_dir: str, mult: int) -> None:
    """Worst-case-magnitude corpus: per table, pin every numeric
    measure column to its max |value| observed in the base tables,
    replicate rows x mult with REPLICA-OFFSET keys (k + rep*1e12 on
    every *key/id column, identically across tables) so referential
    joins stay within a replica — volume multiplies, join fan-out and
    dup-group structure don't. Strings/timestamps are copied verbatim
    so parses and groupings still work; only magnitudes are maximized."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        df = spark.read.parquet(f"{SF_DIR}/{t}.parquet")
        key_cols = [
            f.name for f in df.schema.fields
            if (f.name.endswith("key") or f.name in KEY_COLS)
            and isinstance(f.dataType, (T.IntegerType, T.LongType))
        ]
        num_cols = [
            f.name for f in df.schema.fields
            if isinstance(f.dataType, (T.IntegerType, T.LongType,
                                       T.DoubleType, T.FloatType,
                                       T.DecimalType, T.ShortType))
            and f.name not in key_cols
            and f.name not in ("label", "load_seq", "l_linenumber")
        ]
        maxes = {}
        if num_cols:
            row = df.agg(*[F.max(F.abs(F.col(c))).alias(c) for c in num_cols]
                         ).collect()[0]
            maxes = {c: row[c] for c in num_cols}
        proj = [
            F.lit(maxes[f.name]).cast(f.dataType).alias(f.name)
            if f.name in maxes and maxes[f.name] is not None
            else (
                # int32 keys (nation/region) get a smaller offset that
                # still separates replicas without overflowing INT
                (F.col(f.name) + F.col("__rep") * F.lit(
                    KEY_OFFSET if isinstance(f.dataType, T.LongType)
                    else 10**6
                )).cast(f.dataType).alias(f.name)
                if f.name in key_cols
                else F.col(f.name)
            )
            for f in df.schema.fields
        ]
        big = df.crossJoin(
            spark.range(mult).select(F.col("id").alias("__rep"))
        ).select(*proj)
        big.write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")
        print(f"stress {t}: {len(maxes)} cols pinned, {len(key_cols)} keys "
              f"offset, x{mult}", file=sys.stderr)


OVERFLOW_MARKERS = ("ARITHMETIC_OVERFLOW", "CAST_OVERFLOW", "overflow",
                    "NUMERIC_VALUE_OUT_OF_RANGE")


def run_stress(out_dir: str, mult: int, only: list[str] | None = None) -> int:
    from retail_sales_etl_pipeline_spark.plans.registry import load_all
    from retail_sales_etl_pipeline_spark.session import get_spark

    spark = get_spark("overflow-stress", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(os.path.join(out_dir, "lineitem.parquet")):
        build_stress(spark, out_dir, mult)
    registry = load_all()
    if only:
        missing = sorted(set(only) - set(registry))
        if missing:
            print(f"unknown query name(s): {missing}", file=sys.stderr)
            return 2
        registry = {n: registry[n] for n in only}
    overflows: dict[str, str] = {}
    others: dict[str, str] = {}
    for name, q in sorted(registry.items()):
        t0 = time.time()
        try:
            q.spark_fn(spark, out_dir).write.format("noop").mode(
                "overwrite").save()
            print(f"ok    {name} [{time.time() - t0:.1f}s]", file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            msg = str(e)
            first = msg.strip().splitlines()[0][:200]
            if any(k.lower() in msg.lower() for k in OVERFLOW_MARKERS):
                overflows[name] = first
                print(f"OVERFLOW {name}: {first}")
            else:
                others[name] = first
                print(f"err   {name}: {first}", file=sys.stderr)
        spark.catalog.clearCache()
        for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            rdd.unpersist()
    print(json.dumps({"metric": "overflow_stress", "mult": mult,
                      "overflows": overflows,
                      "other_errors": sorted(others),
                      "n_ok": len(registry) - len(overflows) - len(others)}))
    return 1 if overflows else 0


def main() -> int:
    # argparse (r7 advisory): the hand-rolled parser silently ignored
    # `--mult=N` (filtered but never parsed → default 32) and could pop a
    # positional out_dir that textually equalled the mult value.
    import argparse

    p = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    mode = p.add_mutually_exclusive_group(required=True)
    mode.add_argument("--static", action="store_true",
                      help="walk optimized plans for unjustified sum-of-int-product sites")
    mode.add_argument("--stress", action="store_true",
                      help="run every query against a max-magnitude corpus")
    p.add_argument("--emit", metavar="PATH", default=None,
                   help="(--static) write/refresh the allowlist skeleton")
    p.add_argument("out_dir", nargs="?", default="/tmp/stress_corpus",
                   help="(--stress) stress-corpus directory")
    p.add_argument("--mult", type=int, default=32,
                   help="(--stress) volume multiplier (default 32)")
    p.add_argument("--only", default=None,
                   help="(--stress) comma-separated query names to run")
    a = p.parse_args()
    if a.static:
        return run_static(a.emit)
    only = [n for n in (a.only or "").split(",") if n] or None
    return run_stress(a.out_dir, a.mult, only)


if __name__ == "__main__":
    raise SystemExit(main())
