#!/usr/bin/env python3
"""Generate the WRatio fixture table for FuzzyWRatioFixtureSpec.

Reimplements fuzzywuzzy's WRatio in its pure-python mode (difflib
SequenceMatcher — the library's behavior when python-Levenshtein is not
installed) from the published algorithm, then sweeps deterministic
domains of short strings: dictionary-code perturbations, multi-word
names with typos/reorder/extra tokens, and unrelated cross pairs.

Output: src/test/resources/wratio_fixtures.tsv  (s1 \t s2 \t wratio)

The Scala engine scores with a levenshtein-based ratio (documented
difference); the spec asserts GATE-DECISION parity outside the +-5
band around the >=85 threshold plus a bounded score deviation, which is
the contract the reference's repair flow actually depends on.
"""
import random
import re
from difflib import SequenceMatcher


def full_process(s):
    s = re.sub(r"(?ui)\W", " ", s).lower().strip()
    return re.sub(r"\s+", " ", s)


def _ratio(s1, s2):
    return int(round(100 * SequenceMatcher(None, s1, s2).ratio()))


def _partial_ratio(s1, s2):
    shorter, longer = (s1, s2) if len(s1) <= len(s2) else (s2, s1)
    if len(shorter) == 0:
        return 0
    blocks = SequenceMatcher(None, shorter, longer).get_matching_blocks()
    scores = []
    for block in blocks:
        start = max(block[1] - block[0], 0)
        sub = longer[start:start + len(shorter)]
        r = SequenceMatcher(None, shorter, sub).ratio()
        if r > 0.995:
            return 100
        scores.append(r)
    return int(round(100 * max(scores))) if scores else 0


def _sorted_tokens(s):
    return " ".join(sorted(s.split()))


def _token_sort(s1, s2, scorer):
    return scorer(_sorted_tokens(s1), _sorted_tokens(s2))


def _token_set(s1, s2, scorer):
    t1, t2 = set(s1.split()), set(s2.split())
    inter = " ".join(sorted(t1 & t2))
    d12 = " ".join(sorted(t1 - t2))
    d21 = " ".join(sorted(t2 - t1))
    c1 = (inter + " " + d12).strip()
    c2 = (inter + " " + d21).strip()
    return max(scorer(inter, c1), scorer(inter, c2), scorer(c1, c2))


def wratio(s1, s2):
    p1, p2 = full_process(s1), full_process(s2)
    if len(p1) == 0 or len(p2) == 0:
        return 0
    base = _ratio(p1, p2)
    len_ratio = max(len(p1), len(p2)) / min(len(p1), len(p2))
    unbase_scale = 0.95
    if len_ratio < 1.5:
        tsor = _token_sort(p1, p2, _ratio) * unbase_scale
        tser = _token_set(p1, p2, _ratio) * unbase_scale
        return int(max(base, tsor, tser))
    partial_scale = 0.6 if len_ratio > 8 else 0.9
    partial = _partial_ratio(p1, p2) * partial_scale
    ptsor = _token_sort(p1, p2, _partial_ratio) * unbase_scale * partial_scale
    ptser = _token_set(p1, p2, _partial_ratio) * unbase_scale * partial_scale
    return int(max(base, partial, ptsor, ptser))


def main():
    rng = random.Random(20260813)
    letters = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    vocab = ["delta", "united", "star", "alliance", "pacific", "air",
             "lines", "west", "east", "jet", "blue", "sky", "cargo",
             "express", "inter", "national"]

    def perturb(s):
        ops = []
        if len(s) > 1:
            i = rng.randrange(len(s))
            ops.append(s[:i] + s[i + 1:])                      # drop
            i = rng.randrange(len(s) - 1)
            ops.append(s[:i] + s[i + 1] + s[i] + s[i + 2:])    # swap
        i = rng.randrange(len(s))
        ops.append(s[:i] + rng.choice(letters) + s[i + 1:])    # replace
        i = rng.randrange(len(s) + 1)
        ops.append(s[:i] + rng.choice(letters) + s[i:])        # insert
        return rng.choice(ops)

    pairs = []
    # 1. short codes (the reference's repair domain) + perturbations
    for _ in range(120):
        n = rng.choice([2, 3, 3, 4])
        code = "".join(rng.choice(letters) for _ in range(n))
        pairs.append((code, perturb(code)))
        pairs.append((code, "".join(rng.choice(letters)
                                    for _ in range(rng.choice([2, 3, 4])))))
    # 2. multi-word names: typo, reorder, extra/missing tokens
    for _ in range(120):
        k = rng.choice([1, 2, 2, 3])
        words = [rng.choice(vocab) for _ in range(k)]
        name = " ".join(words)
        variant = rng.choice([
            " ".join(rng.sample(words, len(words))),           # reorder
            name + " " + rng.choice(vocab),                    # extra token
            " ".join(words[:-1]) if k > 1 else perturb(name),  # missing
            " ".join(perturb(w) if rng.random() < 0.5 else w
                     for w in words),                          # typos
        ])
        pairs.append((name, variant))
        pairs.append((name, " ".join(rng.choice(vocab)
                                     for _ in range(rng.choice([1, 2])))))
    # 3. substring containment (the partial family's home turf)
    for _ in range(60):
        w = rng.choice(vocab)
        ctx = " ".join(rng.choice(vocab) for _ in range(rng.choice([2, 3])))
        pairs.append((w, w + " " + ctx))
        pairs.append((w.upper(), ctx + " " + w))

    seen = set()
    rows = []
    for a, b in pairs:
        if len(full_process(a)) == 0 or len(full_process(b)) == 0:
            continue
        key = (a, b)
        if key in seen:
            continue
        seen.add(key)
        rows.append((a, b, wratio(a, b)))

    out = "src/test/resources/wratio_fixtures.tsv"
    with open(out, "w") as f:
        for a, b, w in rows:
            f.write(f"{a}\t{b}\t{w}\n")
    hi = sum(1 for _, _, w in rows if w >= 90)
    lo = sum(1 for _, _, w in rows if w <= 80)
    print(f"{len(rows)} pairs -> {out}  (>=90: {hi}, <=80: {lo}, "
          f"band: {len(rows) - hi - lo})")


if __name__ == "__main__":
    main()
