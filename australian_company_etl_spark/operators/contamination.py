"""Multi-phrase containment scan for benchmark decontamination (H8).

Two implementations with identical semantics (case-sensitive substring
presence per (document, phrase)):

- expression path (plans/text.py): broadcast phrase dim × corpus with a
  `contains` join condition — P substring scans per document. Exact, fully
  SQL-expressible (the DuckDB oracle twin), fine for small blocklists.
- automaton path (here): ONE Aho-Corasick pass per document inside an
  Arrow-batched ``mapInPandas``. Cost is O(len(text) + hits) regardless of
  blocklist size — the 100 TB path for real decontamination lists (10⁴–10⁶
  eval n-grams), where P separate `contains` scans would multiply the scan
  bill by the blocklist size.

The automaton is built once per task from the broadcast phrase list (plain
Python closure capture — the list serializes with the UDF), then streamed
over the batch iterator; the corpus is never shuffled.
"""

from __future__ import annotations

from collections import deque
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class AhoCorasick:
    """Classic goto/fail/output automaton over unicode chars."""

    def __init__(self, patterns: list[str]):
        self.goto: list[dict[str, int]] = [{}]
        self.out: list[list[int]] = [[]]
        for idx, p in enumerate(patterns):
            node = 0
            for ch in p:
                nxt = self.goto[node].get(ch)
                if nxt is None:
                    self.goto.append({})
                    self.out.append([])
                    nxt = len(self.goto) - 1
                    self.goto[node][ch] = nxt
                node = nxt
            self.out[node].append(idx)
        self.fail = [0] * len(self.goto)
        q: deque[int] = deque(self.goto[0].values())
        while q:
            u = q.popleft()
            for ch, v in self.goto[u].items():
                q.append(v)
                f = self.fail[u]
                while f and ch not in self.goto[f]:
                    f = self.fail[f]
                cand = self.goto[f].get(ch, 0)
                self.fail[v] = cand if cand != v else 0
                self.out[v] = self.out[v] + self.out[self.fail[v]]

    def patterns_present(self, text: str) -> set[int]:
        node, found = 0, set()
        g, fail, out = self.goto, self.fail, self.out
        for ch in text:
            while node and ch not in g[node]:
                node = fail[node]
            node = g[node].get(ch, 0)
            if out[node]:
                found.update(out[node])
        return found


def contamination_hits_automaton(docs: DataFrame, phrases: list[str]) -> DataFrame:
    """(doc_id, phrase) rows for every document containing the phrase —
    one automaton pass per document, Arrow-batched."""
    import pandas as pd

    pats = list(phrases)

    def scan(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        ac = AhoCorasick(pats)  # built once per task, reused across batches
        for pdf in batches:
            out_doc: list[int] = []
            out_phrase: list[str] = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                for idx in ac.patterns_present(text or ""):
                    out_doc.append(doc_id)
                    out_phrase.append(pats[idx])
            yield pd.DataFrame({"doc_id": out_doc, "phrase": out_phrase})

    return docs.select("doc_id", "text").mapInPandas(scan, "doc_id long, phrase string")


def contamination_report(
    docs: DataFrame, phrases_df: DataFrame, phrases: list[str], use_automaton: bool
) -> DataFrame:
    """Per-phrase containing-doc count + first hit; zero-hit phrases kept
    via the left join from the broadcast phrase dim."""
    if use_automaton:
        hits = contamination_hits_automaton(docs, phrases)
        joined = F.broadcast(phrases_df).join(hits, "phrase", "left")
    else:
        joined = F.broadcast(phrases_df).join(
            docs, F.col("text").contains(F.col("phrase")), "left"
        )
    return (
        joined.groupBy("phrase")
        .agg(F.count("doc_id").alias("n_docs"), F.min("doc_id").alias("first_doc"))
        .orderBy("phrase")
    )
