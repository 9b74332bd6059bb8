"""End-to-end retail-pipeline benchmark at the reference's exact scale.

Generates a 541,909-row synthetic retail CSV (the reference dataset's row
count, with its quirk distribution: ~25% NULL customers, ~2% returns,
~0.5% zero-qty, dups, bad dates) and runs the full pipeline — ingest →
clean (4 stages + metrics) → dims (upsert + surrogate keys) → fact
(broadcast star join, monthly-partitioned write) → quality/metadata logs —
against the reference envelope: <= 60 min wall on a single node
(BASELINE.md).

Usage: python tools/bench_pipeline.py [n_rows]
Prints one JSON line with stage timings and the pipeline report.
"""

from __future__ import annotations

import csv
import json
import os
import random
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 541_909


def generate_csv(path: str, n: int, seed: int = 42) -> None:
    rng = random.Random(seed)
    countries = ["United Kingdom"] * 30 + ["France", "Germany", "Spain", "Netherlands",
                 "Belgium", "Switzerland", "Portugal", "Italy"]
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["InvoiceNo", "StockCode", "Description", "Quantity",
                    "InvoiceDate", "UnitPrice", "CustomerID", "Country"])
        for i in range(n):
            r = rng.random()
            invoice = f"{536365 + i // 20}"
            if rng.random() < 0.02:
                invoice = "C" + invoice  # cancellations kept as-is
            stock = f"{84000 + rng.randrange(4000)}"
            desc = f"PRODUCT {stock} DESC"
            qty = rng.randrange(1, 50)
            if r < 0.02:
                qty = -qty  # returns (kept)
            elif r < 0.025:
                qty = 0  # dropped
            day = rng.randrange(374)
            ts = f"2010-12-{1 + day % 9:02d} {8 + rng.randrange(10)}:{rng.randrange(60):02d}:00" \
                if day < 9 else \
                f"2011-{1 + (day - 9) // 31:02d}-{1 + (day - 9) % 28:02d} {8 + rng.randrange(10)}:{rng.randrange(60):02d}:00"
            if rng.random() < 0.001:
                ts = "garbage-date"  # coerce -> NULL -> dropped
            price = f"{rng.randrange(10, 50000) / 100:.2f}"
            if rng.random() < 0.005:
                price = "0.00"  # dropped
            cust = "" if rng.random() < 0.25 else f"{12346 + rng.randrange(4400)}"
            country = rng.choice(countries)
            # occasional exact duplicates (cleaned by W1)
            w.writerow([invoice, stock, desc, qty, ts, price, cust, country])
            if rng.random() < 0.005:
                w.writerow([invoice, stock, desc + " ALT", qty, ts, price, cust, country])


def main() -> None:
    from retail_sales_etl_pipeline_spark.plans import retail_pipeline
    from retail_sales_etl_pipeline_spark.session import get_spark

    tmp = tempfile.mkdtemp(prefix="retail_bench_")
    csv_path = os.path.join(tmp, "online_retail.csv")
    t0 = time.time()
    generate_csv(csv_path, N_ROWS)
    t_gen = time.time() - t0

    spark = get_spark("pipeline-bench")
    spark.sparkContext.setLogLevel("ERROR")
    # Reference gate: 400,000 of 541,909 raw rows (~74%). Scale it with the
    # requested size so smaller smoke runs exercise the same proportional
    # gate instead of tripping the absolute one.
    min_rows = int(N_ROWS * 400_000 / 541_909)
    t1 = time.time()
    res = retail_pipeline.run(
        spark, csv_path, os.path.join(tmp, "warehouse"), min_rows=min_rows
    )
    t_pipe = time.time() - t1

    print(
        json.dumps(
            {
                "metric": "retail_pipeline_e2e_wall",
                "value": round(t_pipe, 2),
                "unit": "sec",
                "n_rows_raw": res.raw_rows,
                "n_rows_cleaned": res.cleaned_rows,
                "n_rows_fact": res.fact_rows,
                "dims": [res.dim_product_rows, res.dim_customer_rows, res.dim_date_rows],
                "revenue": res.total_revenue,
                "stage_metrics": [
                    [m.stage_name, m.rows_before, m.rows_after] for m in res.stage_metrics
                ],
                "csv_gen_sec": round(t_gen, 2),
                "reference_envelope_sec": 3600,
            }
        )
    )


if __name__ == "__main__":
    main()
