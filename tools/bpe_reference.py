#!/usr/bin/env python3
"""Independent reference implementation of byte-level BPE (the public
GPT-2 scheme: pre-tokenizer regex -> bytes_to_unicode alphabet ->
rank-ordered merge loop over a merges table).

Purpose: generate GOLDEN token vectors that pin the Scala
`bpe_encode` Catalyst expression (graft.functions.BpeEncode) in
BpeEncodeSpec. This file is the independent implementation the spec's
fixtures were computed with -- run it to regenerate them:

    python3 tools/bpe_reference.py

It prints the (merges, text) -> tokens cases used by the spec as
Scala-ish literals.
"""
import json
import regex  # the GPT-2 pattern needs \p{L}/\p{N}; stdlib `re` lacks them

PRE = regex.compile(
    r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+""")


def bytes_to_unicode():
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("\xa1"), ord("\xac") + 1))
          + list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(2 ** 8):
        if b not in bs:
            bs.append(b)
            cs.append(2 ** 8 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


B2U = bytes_to_unicode()


def get_pairs(word):
    return {(word[i], word[i + 1]) for i in range(len(word) - 1)}


def bpe_word(word, ranks):
    word = tuple(word)
    while len(word) > 1:
        pairs = get_pairs(word)
        best = min(pairs, key=lambda p: ranks.get(p, float("inf")))
        if best not in ranks:
            break
        a, b = best
        out, i = [], 0
        while i < len(word):
            if i < len(word) - 1 and word[i] == a and word[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(word[i])
                i += 1
        word = tuple(out)
    return list(word)


def encode(text, merge_lines):
    ranks = {}
    for i, line in enumerate(l.strip() for l in merge_lines):
        if line and not line.startswith("#") and " " in line:
            pair = tuple(line.split(" ", 1))
            if pair not in ranks:
                ranks[pair] = i
    tokens = []
    for m in PRE.findall(text):
        mapped = [B2U[b] for b in m.encode("utf-8")]
        tokens.extend(bpe_word(mapped, ranks))
    return tokens


U2B = {c: b for b, c in B2U.items()}


def train(texts, num_merges, min_pair_freq=2):
    """Greedy BPE merge learning over `texts` -- the independent twin of
    graft.ops.BpeTrain (both arms). Selection rule, kept in EXACT
    lockstep with the Scala trainers: highest summed pair frequency,
    ties broken by the lexicographically SMALLEST "left right" pair
    string (code-point order == the Scala side's BMP string order),
    stop when the best frequency < min_pair_freq. Returns merges.txt
    lines in learned order.
    """
    from collections import Counter
    words = Counter()
    for t in texts:
        for m in PRE.findall(t):
            words[tuple(B2U[b] for b in m.encode("utf-8"))] += 1
    merges = []
    for _ in range(num_merges):
        counts = Counter()
        for word, f in words.items():
            for i in range(len(word) - 1):
                counts[word[i] + " " + word[i + 1]] += f
        if not counts:
            break
        best = min(counts, key=lambda k: (-counts[k], k))
        if counts[best] < min_pair_freq:
            break
        merges.append(best)
        a, b = best.split(" ", 1)
        ab = a + b
        new_words = Counter()
        for word, f in words.items():
            out, i = [], 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == a and word[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            new_words[tuple(out)] += f
        words = new_words
    return merges


# Fixture corpus for the trainer golden: repeated words force a
# deterministic merge order; singletons exercise the min_pair_freq
# stop; multi-byte text exercises the byte alphabet end to end.
TRAIN_CORPUS = [
    "the cat sat on the mat",
    "the cat ate the rat",
    "a cat and the hat",
    "low lower lowest low low",
    "new newer newest new",
    "caf\u00e9 caf\u00e9 crema",
    "unique singleton tokens appear once",
]


if __name__ == "__main__":
    # the spec's fixed merges table: enough structure to exercise rank
    # priority, multi-step merges, the G-space marker, and digits
    MERGES = [
        "#version: spec-fixture",
        "h e",          # rank 0
        "l l",          # rank 1
        "he ll",        # rank 2
        "hell o",       # rank 3
        "Ġ w",     # rank 4: 'Ġ w' -- space marker merges
        "Ġw o",    # rank 5
        "Ġwo r",   # rank 6
        "Ġwor ld", # rank 7 (needs 'l d' first -- absent, so dead)
        "l d",          # rank 8
        "Ġwor l",  # rank 9
        "1 2",          # rank 10
        "12 3",         # rank 11
    ]
    CASES = [
        "hello world",
        "hello  world",      # double space: 'Ġ' token survives alone
        "Hello, world! 123", # punctuation + digits + case sensitivity
        "hell",
        "",
        "café ü",  # multi-byte UTF-8 through the byte alphabet
        "a !",   # NBSP: Unicode \s, must NOT join the punct branch
        "a b",   # thin space
        "　hello",  # ideographic space
    ]
    for text in CASES:
        toks = encode(text, MERGES)
        print(f"{json.dumps(text)} -> {json.dumps(toks, ensure_ascii=False)}")
    print("--- trainer golden (TRAIN_CORPUS, num_merges=24, min_pair_freq=2) ---")
    learned = train(TRAIN_CORPUS, 24)
    print(json.dumps(learned, ensure_ascii=False))
    print("--- re-encode with learned merges ---")
    for text in TRAIN_CORPUS[:2]:
        print(f"{json.dumps(text)} -> {json.dumps(encode(text, learned), ensure_ascii=False)}")
