"""Full-text retrieval engine: inverted-index build + BM25 top-k.

This is the graft of the reference's retrieval contract (candidate
generation by label match -> weighted scoring -> deterministic top-k,
/root/reference/fornax/api.py:940-1041 and fornax/opt.py) onto
full-text search per BASELINE.json: term matching -> BM25 -> top-k with
(score DESC, doc_id ASC) tie-breaking.
"""
