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


def dump(src, dst):
    rows = []
    with open(src) as f:
        for row in csv.DictReader(f):
            # raw DictReader values + the executed-reference pre_process
            # output, so the Scala side can assert normalizeText parity on
            # every cell
            rows.append({"raw": row,
                         "clean": {k: pre_process(v) for k, v in row.items()}})
    json.dump(rows, open(dst, "w"), ensure_ascii=False)
    print(f"{len(rows)} rows -> {dst}")


dump(SRC, DST)

# the RecordLink / Gazetteer benchmark datasets (canonical_matching.py:24-25)
D = "/root/reference/benchmarks/benchmarks/datasets"
dump(f"{D}/restaurant-1.csv", "/root/repo/src/main/resources/restaurant_link_1.json")
dump(f"{D}/restaurant-2.csv", "/root/repo/src/main/resources/restaurant_link_2.json")
