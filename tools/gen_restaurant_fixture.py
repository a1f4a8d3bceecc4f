#!/usr/bin/env python3
"""Dump the reference's restaurant benchmark dataset to a JSON fixture.

`benchmarks/benchmarks/common.py:22-30` loads
`datasets/restaurant-nophone-training.csv` with csv.DictReader (default
dialect — NO skipinitialspace, so mid-row fields keep their leading space
and literal quotes) and then pre-processes each value. This script captures
the RAW DictReader values (the csv-dialect half, which we do not
reimplement) in file order; the pre-process half runs in Scala
(TextHash.normalizeText, parity-pinned by preprocess_fuzz.json).
"""
import csv
import json

SRC = "/root/reference/benchmarks/benchmarks/datasets/restaurant-nophone-training.csv"
DST = "/root/repo/src/main/resources/restaurant_training.json"

import re


def pre_process(column):
    # benchmarks/benchmarks/common.py:12-19, verbatim semantics
    column = re.sub("  +", " ", column)
    column = re.sub("\n", " ", column)
    column = column.strip().strip('"').strip("'").lower()
    if not column:
        column = None
    return column


rows = []
with open(SRC) as f:
    for row in csv.DictReader(f):
        # raw DictReader values + the executed-reference pre_process output,
        # so the Scala side can assert normalizeText parity on all 4320 cells
        rows.append({"raw": row, "clean": {k: pre_process(v) for k, v in row.items()}})
json.dump(rows, open(DST, "w"), ensure_ascii=False)
print(f"{len(rows)} rows -> {DST}")
print(json.dumps(rows[0], ensure_ascii=False))
