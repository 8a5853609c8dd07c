from .text import (  # noqa: F401
    tokenize,
    text_stats,
    text_quality,
    lang_id_heuristic,
    doc_fingerprint,
)
from .dedup_approx import (  # noqa: F401
    minhash_signatures,
    minhash_lsh_pairs,
    shingle_jaccard_pairs,
    simhash,
)
from .similarity import cosine_topk, embedding_norms, cosine_pairs  # noqa: F401
