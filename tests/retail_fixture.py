"""Deterministic synthetic retail CSV (FIXTURES.md §A1) with hand-computable
expected outcomes for every cleaning stage."""

from __future__ import annotations

import csv
import os
from dataclasses import dataclass
from decimal import Decimal

HEADER = [
    "InvoiceNo",
    "StockCode",
    "Description",
    "Quantity",
    "InvoiceDate",
    "UnitPrice",
    "CustomerID",
    "Country",
]


@dataclass
class Expected:
    raw_rows: int
    after_nulls: int
    after_dedup: int
    after_zero_qty: int
    after_price: int
    revenue: Decimal
    n_products: int
    n_customers: int  # distinct non-null customer ids (+1 UNKNOWN in dim)
    n_dates: int
    survivor_descriptions: dict[str, str]  # invoice_no -> description kept


def write_fixture_csv(path: str) -> Expected:
    rows: list[list[str]] = []

    def add(inv, stock, desc, qty, ts, price, cust, country):
        rows.append([inv, stock, desc, qty, ts, price, cust, country])

    # 20 clean baseline rows: invoices 100000+i, 5 products, 4 customers
    # (one row per (invoice, product)), all on distinct timestamps.
    for i in range(20):
        add(
            f"1{i:05d}",
            f"P{i % 5:03d}",
            f"PRODUCT {i % 5}",
            str(1 + i % 7),
            f"2011-03-{1 + i % 9:02d} 10:{i:02d}:00",
            f"{1.50 + (i % 4):.2f}",
            ["17850", "13047", "12583", ""][i % 4],  # every 4th NULL customer
            ["United Kingdom", "France", "Germany", "United Kingdom"][i % 4],
        )

    # F1 casualties: nulls in required columns (4 rows)
    add("", "P000", "NULL INVOICE", "2", "2011-03-02 09:00:00", "2.50", "17850", "UK")
    add("200001", "", "NULL STOCK", "2", "2011-03-02 09:01:00", "2.50", "17850", "UK")
    add("200002", "P001", "NULL QTY", "", "2011-03-02 09:02:00", "2.50", "17850", "UK")
    add("200003", "P001", "BAD DATE", "2", "not-a-date", "2.50", "17850", "UK")  # coerce→NULL→F1

    # W1 duplicates: same 6-col key, DIFFERENT description/country — survivor
    # must carry the FIRST row's values (file order).
    add("300000", "P100", "FIRST DESC", "5", "2011-04-01 12:00:00", "3.00", "14000", "Spain")
    add("300000", "P100", "SECOND DESC", "5", "2011-04-01 12:00:00", "3.00", "14000", "Italy")
    add("300000", "P100", "THIRD DESC", "5", "2011-04-01 12:00:00", "3.00", "14000", "Malta")
    # duplicate with NULL customer (COALESCE('') grouping)
    add("300001", "P101", "NULLCUST A", "2", "2011-04-01 13:00:00", "4.00", "", "UK")
    add("300001", "P101", "NULLCUST B", "2", "2011-04-01 13:00:00", "4.00", "", "UK")

    # F2 casualties: zero quantity (negative qty KEPT — returns)
    add("400000", "P102", "ZERO QTY", "0", "2011-05-01 10:00:00", "2.00", "13047", "UK")
    add("400001", "P102", "RETURN KEPT", "-3", "2011-05-01 10:30:00", "2.00", "13047", "UK")

    # F3 casualties: zero/negative price
    add("500000", "P103", "FREE ITEM", "2", "2011-06-01 10:00:00", "0.00", "12583", "France")
    add("500001", "P103", "NEG PRICE", "2", "2011-06-01 10:05:00", "-1.00", "12583", "France")
    # P103 survives via a good row
    add("500002", "P103", "GOOD PRICE", "2", "2011-06-01 10:10:00", "1.25", "12583", "France")

    # 'nan' literal customer → NULL (pandas quirk, reference dag1:73)
    add("600000", "P104", "NAN CUST", "1", "2011-07-01 09:00:00", "9.99", "nan", "UK")

    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(HEADER)
        w.writerows(rows)

    raw = len(rows)
    after_nulls = raw - 4  # F1: 3 null-required + 1 bad date
    after_dedup = after_nulls - 3  # W1: 2 dup copies of 300000, 1 of 300001
    after_zero = after_dedup - 1  # F2: the single zero-qty row
    after_price = after_zero - 2  # F3: free + negative price

    # revenue over survivors
    rev = Decimal("0.00")
    for i in range(20):
        rev += (1 + i % 7) * Decimal(f"{1.50 + (i % 4):.2f}")
    rev += 5 * Decimal("3.00")  # 300000 survivor
    rev += 2 * Decimal("4.00")  # 300001 survivor
    rev += -3 * Decimal("2.00")  # return kept
    rev += 2 * Decimal("1.25")  # good P103
    rev += 1 * Decimal("9.99")  # nan-cust row

    return Expected(
        raw_rows=raw,
        after_nulls=after_nulls,
        after_dedup=after_dedup,
        after_zero_qty=after_zero,
        after_price=after_price,
        revenue=rev,
        n_products=10,  # P000-P004 + P100,P101,P102,P103,P104
        n_customers=4,  # 17850.0, 13047.0, 12583.0, 14000.0
        # baseline rows land on 2011-03-01..09 (9 days), plus 04-01, 05-01,
        # 06-01, 07-01 from the surviving edge-case rows
        n_dates=13,
        survivor_descriptions={"300000": "FIRST DESC", "300001": "NULLCUST A"},
    )


def fixture_path(tmpdir: str) -> tuple[str, Expected]:
    path = os.path.join(tmpdir, "retail.csv")
    exp = write_fixture_csv(path)
    return path, exp
