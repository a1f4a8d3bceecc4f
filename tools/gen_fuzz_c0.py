#!/usr/bin/env python3
"""Extend the executed-reference fuzz fixtures with C0-separator inputs.

Round-5 ADVICE: Python str.split() treats 0x1c-0x1f (FS/GS/RS/US) as
whitespace but Unicode White_Space (Java (?U)\\s) does not — the round-4
corpus had no such chars, so the parity fix could not be pinned. This script
executes the reference's OWN predicate_functions.py (pure-python cpredicates
stand-ins) and benchmarks/common.py pre_process over a deterministic corpus
rich in 0x1c-0x1f, and APPENDS the (input, output) rows to
src/test/resources/predicate_fuzz.json / preprocess_fuzz.json.
Idempotent: rows whose input is already present are skipped.
"""
import json
import random
import re
import sys

REF = "/root/reference"
RES = "/root/repo/src/test/resources"


def load_reference_predicates():
    src = open(f"{REF}/dedupe/predicate_functions.py").read()
    src = re.sub(r"^from dedupe\.cpredicates import.*$", "", src, flags=re.M)
    src = re.sub(r"^(from|import).*doublemetaphone.*$", "", src, flags=re.M)
    env = {"doublemetaphone": lambda s: ("", "")}

    def ngrams(field, n):
        return [field[i:i + n] for i in range(len(field) - n + 1)]

    def initials(field, n):
        return [field[:n]]

    env["ngrams"] = ngrams
    env["unique_ngrams"] = lambda field, n: frozenset(ngrams(field, n))
    env["initials"] = initials
    exec(compile(src, "predicate_functions.py", "exec"), env)
    return env


def string_preprocess(s):
    # predicates.py:97-103 StringPredicate preprocessing: strip punctuation,
    # collapse whitespace
    import string
    s = s.translate(str.maketrans("", "", string.punctuation))
    return " ".join(s.split())


def pre_process(column):
    # benchmarks/benchmarks/common.py:12-19
    column = re.sub("  +", " ", column)
    column = re.sub("\n", " ", column)
    column = column.strip().strip('"').strip("'").lower()
    if not column:
        column = None
    return column


FUNCS = [
    "wholeFieldPredicate", "tokenFieldPredicate", "firstTokenPredicate",
    "firstTwoTokensPredicate", "commonIntegerPredicate", "alphaNumericPredicate",
    "nearIntegersPredicate", "hundredIntegerPredicate", "hundredIntegersOddPredicate",
    "firstIntegerPredicate", "commonTwoTokens", "commonThreeTokens",
    "fingerprint", "oneGramFingerprint", "twoGramFingerprint",
    "commonFourGram", "commonSixGram", "sameThreeCharStartPredicate",
    "sameFiveCharStartPredicate", "sameSevenCharStartPredicate",
    "suffixArray", "sortedAcronym",
]


def corpus():
    rng = random.Random(1437)
    c0 = ["\x1c", "\x1d", "\x1e", "\x1f"]
    atoms = ["ab", "42", "x", "中文", "é", "٣٤", "'s", "a.b", "  ", " ",
             "\t", "\n", " ", " ", "Z9", "go", "07"]
    out = []
    # every C0 char alone between two tokens, leading, trailing, doubled
    for c in c0:
        out += [f"a{c}b", f"{c}ab", f"ab{c}", f"a{c}{c}b", f"1{c}2",
                f"a {c} b", f"{c}", f"ab{c}cd ef"]
    # random mixes, each guaranteed at least one C0 char
    for _ in range(40):
        k = rng.randint(2, 7)
        parts = [rng.choice(atoms) for _ in range(k)]
        parts.insert(rng.randrange(len(parts) + 1), rng.choice(c0))
        out.append("".join(parts))
    return out


def main():
    env = load_reference_predicates()
    inputs = corpus()

    path = f"{RES}/predicate_fuzz.json"
    rows = json.load(open(path))
    seen = {r["input"] for r in rows}
    added = 0
    for raw in inputs:
        if raw in seen:
            continue
        # the fixture feeds RAW strings into the bare predicate functions
        # (StringPredicate preprocessing is pinned separately below and by
        # the round-4 preprocess rows)
        keys = {}
        for fn in FUNCS:
            keys[fn] = sorted(str(k) for k in env[fn](raw))
        rows.append({"input": raw, "keys": keys})
        seen.add(raw)
        added += 1
    json.dump(rows, open(path, "w"), ensure_ascii=False)
    print(f"predicate_fuzz.json: +{added} -> {len(rows)} rows")

    # StringPredicate preprocessing parity (predicates.py:97-103), over the
    # C0 corpus AND the round-4 preprocess corpus inputs
    path = f"{RES}/strpred_fuzz.json"
    try:
        rows = json.load(open(path))
    except FileNotFoundError:
        rows = []
    seen = {r["input"] for r in rows}
    extra = [r["input"] for r in json.load(open(f"{RES}/preprocess_fuzz.json"))]
    added = 0
    for raw in inputs + extra:
        if raw in seen:
            continue
        rows.append({"input": raw, "out": string_preprocess(raw)})
        seen.add(raw)
        added += 1
    json.dump(rows, open(path, "w"), ensure_ascii=False)
    print(f"strpred_fuzz.json: +{added} -> {len(rows)} rows")

    path = f"{RES}/preprocess_fuzz.json"
    rows = json.load(open(path))
    seen = {r["input"] for r in rows}
    added = 0
    for raw in inputs:
        if raw in seen:
            continue
        rows.append({"input": raw, "norm": pre_process(raw)})
        seen.add(raw)
        added += 1
    json.dump(rows, open(path, "w"), ensure_ascii=False)
    print(f"preprocess_fuzz.json: +{added} -> {len(rows)} rows")


if __name__ == "__main__":
    sys.exit(main())
