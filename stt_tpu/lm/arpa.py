"""ARPA n-gram models: read/write, and interpolated modified-Kneser-Ney
estimation from text.

This replaces the reference's dependency on external KenLM binaries
(`lmplz` subprocess calls in data/lm/generate_lm.py:79-129) with a
native estimator usable for domain scorers; large-corpus estimation can
still ingest an externally-built ARPA through `read_arpa`.

Probabilities are log10 (ARPA convention). Backoff entries are omitted
for highest order; missing backoff means 0.0.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from typing import Dict, Iterable, List, Optional, Tuple

NGram = Tuple[str, ...]

BOS = "<s>"
EOS = "</s>"
UNK = "<unk>"


class ArpaModel:
    def __init__(self, order: int):
        self.order = order
        # per order (1-based): {ngram tuple: (log10 prob, log10 backoff)}
        self.ngrams: List[Dict[NGram, Tuple[float, float]]] = [
            {} for _ in range(order)
        ]

    def add(self, ngram: NGram, prob: float, backoff: float = 0.0) -> None:
        self.ngrams[len(ngram) - 1][ngram] = (prob, backoff)

    def counts(self) -> List[int]:
        return [len(d) for d in self.ngrams]

    @property
    def vocabulary(self) -> List[str]:
        return [w for (w,) in self.ngrams[0]]

    # -- scoring (reference semantics, used for oracle tests) --------------

    def score(self, context: NGram, word: str) -> float:
        """log10 P(word | context) with standard Katz backoff walk."""
        context = tuple(context)[-(self.order - 1) :]
        for i in range(len(context) + 1):
            ngram = context[i:] + (word,)
            entry = self.ngrams[len(ngram) - 1].get(ngram)
            if entry is not None:
                prob = entry[0]
                # charge backoffs of longer context suffixes
                for j in range(i):
                    ctx = context[j:]
                    ctx_entry = self.ngrams[len(ctx) - 1].get(ctx)
                    if ctx_entry is not None:
                        prob += ctx_entry[1]
                return prob
        unk = self.ngrams[0].get((UNK,))
        prob = unk[0] if unk else -99.0
        for j in range(len(context)):
            ctx = context[j:]
            ctx_entry = self.ngrams[len(ctx) - 1].get(ctx)
            if ctx_entry is not None:
                prob += ctx_entry[1]
        return prob


def read_arpa(path_or_lines) -> ArpaModel:
    if isinstance(path_or_lines, str):
        with open(path_or_lines, "r", encoding="utf-8") as f:
            lines = f.read().splitlines()
    else:
        lines = list(path_or_lines)
    it = iter(lines)
    counts = []
    for line in it:
        line = line.strip()
        if line == "\\data\\":
            break
    for line in it:
        line = line.strip()
        if not line:
            break
        if line.startswith("ngram"):
            counts.append(int(line.split("=")[1]))
    model = ArpaModel(len(counts))
    current = 0
    for line in it:
        line = line.strip()
        if not line:
            continue
        if line == "\\end\\":
            break
        if line.startswith("\\") and line.endswith("-grams:"):
            current = int(line[1:].split("-")[0])
            continue
        parts = line.split("\t")
        if len(parts) < 2:
            parts = line.split()
            parts = [parts[0], " ".join(parts[1:current + 1])] + parts[current + 1:]
        prob = float(parts[0])
        ngram = tuple(parts[1].split())
        backoff = float(parts[2]) if len(parts) > 2 else 0.0
        model.add(ngram, prob, backoff)
    return model


def write_arpa(model: ArpaModel, path: str) -> None:
    with open(path, "w", encoding="utf-8") as f:
        f.write("\\data\\\n")
        for i, count in enumerate(model.counts(), start=1):
            f.write(f"ngram {i}={count}\n")
        for i, table in enumerate(model.ngrams, start=1):
            f.write(f"\n\\{i}-grams:\n")
            for ngram, (prob, backoff) in table.items():
                text = " ".join(ngram)
                if i < model.order and backoff != 0.0:
                    f.write(f"{prob:.7f}\t{text}\t{backoff:.7f}\n")
                else:
                    f.write(f"{prob:.7f}\t{text}\n")
        f.write("\n\\end\\\n")


def estimate_kneser_ney(
    sentences: Iterable[List[str]],
    order: int = 3,
    discount: float = 0.75,
    vocabulary: Optional[set] = None,
) -> ArpaModel:
    """Interpolated Kneser-Ney with a fixed discount (absolute
    discounting + continuation counts) — the standard recipe lmplz
    implements with estimated discounts. Sentences are word lists; BOS/EOS
    are added here."""
    counts: List[Counter] = [Counter() for _ in range(order)]
    for words in sentences:
        if vocabulary is not None:
            words = [w if w in vocabulary else UNK for w in words]
        toks = [BOS] + list(words) + [EOS]
        for n in range(1, order + 1):
            for i in range(len(toks) - n + 1):
                ngram = tuple(toks[i : i + n])
                if n == 1 and ngram == (BOS,):
                    continue  # <s> gets no unigram probability
                counts[n - 1][ngram] += 1

    # continuation counts for lower orders (KN): N1+(• w)
    continuation: List[Counter] = [Counter() for _ in range(order)]
    for n in range(2, order + 1):
        seen = set()
        for ngram in counts[n - 1]:
            suffix = ngram[1:]
            key = (ngram[0], suffix)
            if key not in seen:
                seen.add(key)
                continuation[n - 2][suffix] += 1

    model = ArpaModel(order)
    vocab = set(w for (w,) in counts[0]) | {UNK}
    total_continuation_bigrams = sum(continuation[0].values())

    def interp_prob(ngram: NGram) -> float:
        """Interpolated KN probability (linear domain)."""
        n = len(ngram)
        if n == 1:
            # continuation probability at the bottom, uniform floor for unk
            cont = continuation[0].get(ngram, 0)
            p = cont / max(total_continuation_bigrams, 1)
            return p if p > 0 else 1.0 / (10 * max(len(vocab), 1))
        prefix = ngram[:-1]
        if n == order:
            num = counts[n - 1].get(ngram, 0)
            den = counts[n - 2].get(prefix, 0)
        else:
            num = continuation[n - 1].get(ngram, 0)
            den = sum(
                c for g, c in continuation[n - 1].items() if g[:-1] == prefix
            )
            if den == 0:  # fall back to raw counts (e.g. <s> contexts)
                num = counts[n - 1].get(ngram, 0)
                den = counts[n - 2].get(prefix, 0)
        if den == 0:
            return interp_prob(ngram[1:])
        types = len([g for g in counts[n - 1] if g[:-1] == prefix])
        lam = discount * types / den
        return max(num - discount, 0) / den + lam * interp_prob(ngram[1:])

    # precompute prefix type counts to avoid O(n^2) scans
    prefix_types: List[Counter] = [Counter() for _ in range(order)]
    for n in range(2, order + 1):
        for g in counts[n - 1]:
            prefix_types[n - 1][g[:-1]] += 1

    # unigrams (plus <s> entry with prob "-99" like lmplz)
    norm = 0.0
    uni_probs = {}
    for (w,) in list(counts[0].keys()) + ([(UNK,)] if (UNK,) not in counts[0] else []):
        p = interp_prob((w,))
        uni_probs[w] = p
        norm += p
    for w, p in uni_probs.items():
        model.add((w,), math.log10(p / norm))
    model.add((BOS,), -99.0)

    # higher orders
    for n in range(2, order + 1):
        for ngram in counts[n - 1]:
            p = interp_prob(ngram)
            if p > 0:
                model.add(ngram, math.log10(p))

    # backoffs: weight mass reserved by discounting at each context
    for n in range(1, order):
        table = model.ngrams[n - 1]
        for ngram in list(table.keys()):
            types = prefix_types[n][ngram] if n >= 1 else 0
            den = counts[n - 1].get(ngram, 0)
            if types > 0 and den > 0:
                backoff = math.log10(max(discount * types / den, 1e-10))
                prob = table[ngram][0]
                table[ngram] = (prob, backoff)
    return model
