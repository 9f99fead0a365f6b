"""Large-scale training-data operators (beyond the reference surface).

Submodules stay import-light; this namespace re-exports the full verb
set so pipelines can ``from siuba_spark.corpus import minhash_near_dups,
gopher_filter, lsh_topk, ...`` without memorizing the file layout.
"""

from .bpe import (  # noqa: F401
    bpe_encode, bpe_token_count, bpe_tokens_col, bpe_train,
)
from .dedup import (  # noqa: F401
    MD5_64_SQL, add_minhash, add_shingles, add_simhash, dedup_clusters,
    drop_near_dups, exact_dedup, fuzzy_pairs, hash64_col, jaccard_pairs,
    lsh_candidate_pairs, minhash_near_dups, simhash_pairs, substring_dedup,
)
from .multimodal import (  # noqa: F401
    decode_audio, decode_images, decode_video,
)
from .quality import (  # noqa: F401
    GOPHER_DEFAULTS, cap_per_key, chunk_tokens, dedup_segments,
    gopher_filter, lm_logprob, lm_train, ngram_contamination,
    pack_sequences, quality_signals, scrub_pii, stratified_sample,
    token_budget_sample, unigram_logprob,
)
from .similarity import (  # noqa: F401
    add_hyperplane_bucket, brute_force_topk, cosine_near_dups,
    cosine_sim_col, ivf_pq_topk, ivf_topk, lsh_topk, pq_topk,
)
from .text import (  # noqa: F401
    filter_blocklist, fingerprint, fix_mojibake, hash_features, lang_id,
    lang_profile_train, lang_score, normalize_text, registrable_domain_col,
    strip_html, text_stats, tf_idf, token_count_bpe, tokenize, url_parts,
    vocab_topk,
)
