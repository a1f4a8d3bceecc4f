#!/usr/bin/env python3
"""Executed-reference fuzz for the TYPED predicate kernels (round 5).

Runs the reference's OWN predicate_functions.py (pure-python cpredicates
stand-ins, stdlib math kept) over deterministic set / float / latlong
corpora and dumps (func, input, output) rows to
src/test/resources/typedpred_fuzz.json for the ScalaTest parity spec.

Covered: commonSetElementPredicate, lastSetElementPredicate,
firstSetElementPredicate, commonTwoElementsPredicate,
commonThreeElementsPredicate, magnitudeOfCardinality (sets);
orderOfMagnitude, roundTo1 (floats); latLongGridPredicate (pairs).
wholeSetPredicate is excluded: its key is Python's str(tuple) rendering
(quoted elements); the kernel uses a documented canonical rendering —
block keys only need within-engine equality.
"""
import json
import random
import re

REF = "/root/reference"
OUT = "/root/repo/src/test/resources/typedpred_fuzz.json"


def load_reference():
    src = open(f"{REF}/dedupe/predicate_functions.py").read()
    src = re.sub(r"^from dedupe\.cpredicates import.*$", "", src, flags=re.M)
    src = re.sub(r"^(from|import).*doublemetaphone.*$", "", src, flags=re.M)
    env = {"doublemetaphone": lambda s: ("", "")}
    env["ngrams"] = lambda field, n: [field[i:i + n] for i in range(len(field) - n + 1)]
    env["unique_ngrams"] = lambda field, n: frozenset(env["ngrams"](field, n))
    env["initials"] = lambda field, n: [field[:n]]
    exec(compile(src, "predicate_functions.py", "exec"), env)
    return env


def main():
    env = load_reference()
    rng = random.Random(20260817)
    words = ["alpha", "beta", "gamma", "Zeta", "éclair", "naïve", "0042",
             "42", "x y", "tab\tsep", "", "ß", "Ω", "pr-1", "12.5", "a'b"]
    rows = []

    set_funcs = ["commonSetElementPredicate", "lastSetElementPredicate",
                 "firstSetElementPredicate", "commonTwoElementsPredicate",
                 "commonThreeElementsPredicate", "magnitudeOfCardinality"]
    sets = [tuple(rng.sample(words, rng.randint(1, min(9, len(words)))))
            for _ in range(60)]
    sets += [("solo",), ("a", "b"), ("b", "a"), ("x",) * 1]
    for s in sets:
        for fn in set_funcs:
            rows.append({"func": fn, "set": list(s),
                         "out": sorted(env[fn](s))})

    floats = [150.0, 0.0523, 123456.789, 1.0, 9.99, 10.0, 0.5, 1.5, 2.5,
              3.1622, 0.05, 0.049999, 1e-4, 7e6, 314.159, 55.0, 45.0,
              650.0, 8500.0, 0.99, 1.01]
    floats += [round(rng.uniform(1e-3, 1e6), rng.randint(0, 4)) for _ in range(80)]
    for v in floats:
        for fn in ["orderOfMagnitude", "roundTo1"]:
            rows.append({"func": fn, "num": v, "out": sorted(env[fn](v))})

    lls = [(42.3, -5.4), (41.05, 2.15), (-33.95, 151.15), (0.04, -0.04),
           (89.96, 179.96), (-0.05, 0.05), (12.25, -12.35)]
    lls += [(round(rng.uniform(-90, 90), rng.randint(1, 4)),
             round(rng.uniform(-180, 180), rng.randint(1, 4))) for _ in range(60)]
    for (lat, lon) in lls:
        rows.append({"func": "latLongGridPredicate", "lat": lat, "lon": lon,
                     "out": sorted(env["latLongGridPredicate"]((lat, lon)))})

    json.dump(rows, open(OUT, "w"), ensure_ascii=False, indent=0)
    print(f"{len(rows)} rows -> {OUT}")


if __name__ == "__main__":
    main()
