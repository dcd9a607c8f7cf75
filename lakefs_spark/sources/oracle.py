"""DuckDB oracle SQL for every gate query in __spark_entry__.queries().

Each SQL string runs on DuckDB over the pre-registered base views
(region nation customer ... documents embeddings) and re-states the
operator semantics independently of the Spark implementation; the
driver hash-compares values. Column names/aliases here MUST match the
Spark side exactly.
"""

from __future__ import annotations

from lakefs_spark.operators.text import STOPWORDS
from lakefs_spark.sources.relspec import (
    diff_sql,
    merge_actions_sql,
    merged_snapshot_sql,
    with_views,
)

# -- listing ---------------------------------------------------------------

LIST_PREFIX = "tables/orders/b3/"
LIST_PREFIX_UPPER = "tables/orders/b30"  # upper_bound_for_prefix(LIST_PREFIX)
LIST_AFTER = "tables/orders/b3/000000000500"
LIST_LIMIT = 200


def q_snapshot_listing() -> str:
    return with_views("snap_a") + "select key, identity, address, size, etag from snap_a"


def q_list_prefix_page() -> str:
    return with_views("snap_a") + f"""
    select key, identity, size, etag from snap_a
    where key >= '{LIST_PREFIX}' and key < '{LIST_PREFIX_UPPER}' and key > '{LIST_AFTER}'
    order by key limit {LIST_LIMIT}
    """


def q_list_delimiter_groups() -> str:
    # prefix 'tables/', delimiter '/': common prefixes only
    return with_views("merge_source") + """
    select distinct 'tables/' || substring(sfx, 1, instr(sfx, '/')) as key,
           true as is_common_prefix
    from (select substring(key, 8, 1000000) as sfx from merge_source) t
    where instr(sfx, '/') > 0
    """


def q_list_delimiter_leaves() -> str:
    return with_views("snap_a") + f"""
    select key, false as is_common_prefix, identity, size, etag from snap_a
    where key >= '{LIST_PREFIX}' and key < '{LIST_PREFIX_UPPER}'
      and instr(substring(key, {len(LIST_PREFIX) + 1}, 1000000), '/') = 0
    """


# -- overlay / staging -----------------------------------------------------

_STAGED_OVERLAY = """
    (select * from (
        select s.*, row_number() over (partition by key order by seq) as rn
        from staged_all s) t
     where rn = 1)
"""


def q_overlay_visible() -> str:
    return with_views("staged_all", "entries") + f"""
    select key, identity, size, etag from (
      select key, identity, size, etag, is_tombstone,
             row_number() over (partition by key order by seq) as rn
      from (
        select seq, is_tombstone, key, identity, size, etag from staged_all
        union all
        select 2 as seq, false as is_tombstone, key, identity, size, etag from entries
      ) u
    ) v
    where rn = 1 and is_tombstone = false
    """


def q_uncommitted_diff() -> str:
    return with_views("staged_all", "entries") + f"""
    select s.key,
           case when s.is_tombstone then 'removed'
                when c.identity is null then 'added'
                else 'changed' end as diff_type,
           coalesce(s.identity, c.identity) as identity
    from {_STAGED_OVERLAY} s
    left join entries c on s.key = c.key
    where not (s.is_tombstone and c.identity is null)
      and not (not s.is_tombstone and s.identity is not distinct from c.identity)
    """


# -- diff / compare / merge ------------------------------------------------


def q_diff_refs() -> str:
    return with_views("snap_a", "snap_b") + diff_sql("snap_a", "snap_b")


def _sync_diff_sql(local: str, remote: str) -> str:
    """(path, change) of a local-vs-remote sync diff; rows equal when
    size and etag both match (operators/sync.py local_diff)."""
    return f"""
    select coalesce(l.key, r.key) as path,
           case when r.key is null then 'added'
                when l.key is null then 'removed'
                else 'changed' end as change
    from {local} l full outer join {remote} r on l.key = r.key
    where l.key is null or r.key is null
       or not (l.size is not distinct from r.size and l.etag is not distinct from r.etag)
    """


def q_local_sync_diff() -> str:
    return with_views("snap_a", "snap_b") + _sync_diff_sql("snap_b", "snap_a")


def q_sync_plan() -> str:
    lc = _sync_diff_sql("merge_source", "merge_base")
    rc = _sync_diff_sql("merge_dest", "merge_base")
    return with_views("merge_base", "merge_source", "merge_dest") + f"""
    select coalesce(lc.path, rc.path) as path,
           case when lc.path is not null and rc.path is not null then 'conflict'
                when lc.change = 'removed' then 'delete_remote'
                when lc.path is not null then 'upload'
                when rc.change = 'removed' then 'delete_local'
                else 'download' end as op
    from ({lc}) lc full outer join ({rc}) rc on lc.path = rc.path
    where not (coalesce(lc.change, '') = 'removed' and coalesce(rc.change, '') = 'removed')
    """


def q_diff_summary() -> str:
    return (
        with_views("snap_a", "snap_b")
        + f"select diff_type, count(*) as n from ({diff_sql('snap_a', 'snap_b')}) d group by diff_type"
    )


def _qualified_diff(base: str, side: str) -> str:
    return f"""
    (select key, diff_type,
            case when diff_type = 'removed' then cast(null as string) else identity end as qident
     from ({diff_sql(base, side)}) qd)
    """


def q_compare_refs() -> str:
    sdiff = _qualified_diff("merge_base", "merge_source")
    ddiff = _qualified_diff("merge_base", "merge_dest")
    return with_views("merge_base", "merge_source", "merge_dest") + f"""
    select s.key,
           case when d.key is not null then 'conflict' else s.diff_type end as diff_type,
           s.qident as identity
    from {sdiff} s
    left join {ddiff} d on s.key = d.key
    where d.key is null or not (s.qident is not distinct from d.qident)
    """


def q_merge_result_src() -> str:
    return with_views("merge_base", "merge_source", "merge_dest") + merged_snapshot_sql(
        "merge_base", "merge_source", "merge_dest", "src"
    )


def q_merge_result_dest() -> str:
    return with_views("merge_base", "merge_source", "merge_dest") + merged_snapshot_sql(
        "merge_base", "merge_source", "merge_dest", "dest"
    )


def q_merge_conflicts() -> str:
    actions = merge_actions_sql("merge_base", "merge_source", "merge_dest", "none")
    return with_views("merge_base", "merge_source", "merge_dest") + f"""
    select key, identity from ({actions}) a where action = 'conflict'
    """


# -- gc --------------------------------------------------------------------


def q_gc_mark() -> str:
    return with_views("storage_listing", "entries", "uncommitted_addresses") + """
    select l.address from storage_listing l
    where not exists (select 1 from entries e where e.address = l.address)
      and not exists (select 1 from uncommitted_addresses u where u.address = l.address)
    """


def q_gc_committed_addresses() -> str:
    return with_views("entries", "merge_source", "merge_dest") + """
    select distinct address from (
      select address from entries
      union all select address from merge_source
      union all select address from merge_dest
    ) t
    """


# -- range stats -----------------------------------------------------------


def q_range_stats() -> str:
    return with_views("snap_a") + """
    select chunk_idx,
           count(*) as n_keys,
           min(key) as min_key,
           max(key) as max_key,
           cast(sum(size) as bigint) as total_size
    from (select key, size,
                 cast(floor((row_number() over (order by key) - 1) / 5000) as bigint) as chunk_idx
          from snap_a) t
    group by chunk_idx
    """


# -- text / dedup ----------------------------------------------------------


def q_dedup_exact() -> str:
    return """
    select md5(text) as text_hash, min(doc_id) as rep_id, count(*) as n_dups
    from documents group by md5(text)
    """


def q_token_counts() -> str:
    return "select doc_id, cast(length(split(text, ' ')) as bigint) as n_tokens from documents"


def q_bpe_pair_stats() -> str:
    # independent restatement with DuckDB lateral range + substr:
    # vocab first (word, freq), pair positions over the vocab, distinct
    # containing words + freq-weighted occurrences, deterministic rank
    return """
    with words as (
      select word, count(*) as freq from (
        select unnest(string_split(text, ' ')) as word from documents
      ) t where word <> '' group by word
    ),
    pairs as (
      select word, freq, substr(word, i, 2) as pair
      from words, unnest(range(1, length(word))) as t(i)
      where length(word) >= 2
    ),
    stats as (
      select pair,
             cast(count(distinct word) as bigint) as n_words,
             cast(sum(freq) as bigint) as n_occ
      from pairs group by pair
    ),
    ranked as (
      select cast(row_number() over (order by n_occ desc, pair) as bigint) as rank,
             pair, n_words, n_occ
      from stats
    )
    select rank, pair, n_words, n_occ from ranked where rank <= 50
    """


def q_vocab_stats() -> str:
    return """
    with tok as (
      select doc_id, tok from (
        select doc_id, unnest(string_split(text, ' ')) as tok from documents
      ) t where tok <> ''
    ),
    stats as (
      select tok as token, count(*) as n_total, count(distinct doc_id) as n_docs
      from tok group by tok
    )
    select token, n_total, n_docs,
           round(ln((select count(*) from documents) / cast(n_docs as double)), 6) as idf
    from stats
    order by n_total desc, token
    limit 200
    """


def q_bpe_token_counts() -> str:
    from lakefs_spark.operators.text import BPE_TOKEN_RE

    pat = BPE_TOKEN_RE.replace("'", "''")
    return f"""
    select doc_id,
           cast(length(regexp_extract_all(text, '{pat}')) as bigint)
             as n_bpe_tokens
    from documents
    """


def q_quality_classifier() -> str:
    # the fixed-weight logistic over the SAME rounded ratios as
    # q_text_quality; keep decision on the rounded score
    sw = _sw_hits_sql("text", "en")
    return f"""
    with feats as (
      select doc_id,
             round(length(regexp_replace(lower(text), '[^a-z]', '', 'g'))
                   / greatest(length(text), 1), 4) as alpha_ratio,
             round({sw} / greatest(cast(length(split(text, ' ')) as double), 1.0), 4)
               as stopword_ratio,
             cast(length(split(text, ' ')) as bigint) as n_tokens
      from documents
    ),
    scored as (
      select doc_id,
             round(1.0 / (1.0 + exp(-( -3.0 + 4.0 * alpha_ratio
                                       + 6.0 * stopword_ratio
                                       + 0.35 * ln(1 + n_tokens)))), 6) as q_score
      from feats
    )
    select doc_id, q_score, q_score >= 0.5 as is_kept from scored
    """


def q_token_fertility() -> str:
    from lakefs_spark.operators.text import BPE_TOKEN_RE

    pat = BPE_TOKEN_RE.replace("'", "''")
    return f"""
    with t as (
      select lang,
             length(text) as nc,
             cast(length(split(text, ' ')) as bigint) as nt,
             cast(length(regexp_extract_all(text, '{pat}')) as bigint) as nb
      from documents
    )
    select lang,
           count(*) as n_docs,
           cast(sum(nc) as bigint) as total_chars,
           cast(sum(nt) as bigint) as total_tokens,
           cast(sum(nb) as bigint) as total_bpe_tokens,
           round(sum(nc) / cast(sum(nt) as double), 6) as chars_per_token,
           round(sum(nc) / cast(sum(nb) as double), 6) as chars_per_bpe_token
    from t group by lang
    """


def _sw_hits_sql(text_expr: str, lang: str) -> str:
    # case-insensitive + doubled spaces so adjacent repeats each count
    # (mirrors operators/text.stopword_hits)
    padded = f"(' ' || replace(lower({text_expr}), ' ', '  ') || ' ')"
    terms = []
    for w in STOPWORDS[lang]:
        needle = f" {w} "
        terms.append(
            f"(length({padded}) - length(replace({padded}, '{needle}', ''))) / {len(needle)}"
        )
    return "(" + " + ".join(terms) + ")"


def q_text_quality() -> str:
    sw = _sw_hits_sql("text", "en")
    return f"""
    select doc_id,
           length(text) as n_chars,
           cast(length(split(text, ' ')) as bigint) as n_tokens,
           cast(length(text) - length(replace(text, ' ', '')) as bigint) as n_spaces,
           cast(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) as bigint) as n_alpha,
           round(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) / greatest(length(text), 1), 4) as alpha_ratio,
           cast({sw} as bigint) as stopword_hits,
           round({sw} / greatest(cast(length(split(text, ' ')) as double), 1.0), 4) as stopword_ratio
    from documents
    """


def q_lang_id() -> str:
    langs = list(STOPWORDS)
    scores = {lg: _sw_hits_sql("text", lg) for lg in langs}
    score_cols = ", ".join(f"{scores[lg]} as s_{lg}" for lg in langs)
    # earlier lang wins ties: lang i needs strictly-greater vs earlier, >= vs later
    cases = []
    for i, lg in enumerate(langs):
        conds = [f"s_{lg} > 0"]
        for j, other in enumerate(langs):
            if j < i:
                conds.append(f"s_{lg} > s_{other}")
            elif j > i:
                conds.append(f"s_{lg} >= s_{other}")
        cases.append(f"when {' and '.join(conds)} then '{lg}'")
    case_sql = "case " + " ".join(cases) + " else 'unk' end"
    return f"""
    select doc_id, {case_sql} as lang_pred
    from (select doc_id, {score_cols} from documents) t
    """


_SHINGLE3 = """
      select distinct doc_id, shingle from (
        select doc_id,
               unnest(list_transform(range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
                                     i -> array_to_string((string_split(text, ' '))[i:i+2], ' ')))
                 as shingle
        from documents {where}
      ) x where shingle <> ''
"""


def q_train_val_split() -> str:
    from lakefs_spark.functions.hashfam import X_MOD

    b = (
        f"cast(concat('0x', substr(md5(concat('split|', cast(doc_id as varchar))), 1, 15)) "
        f"as bigint) % {X_MOD} % 100"
    )
    return f"""
    select doc_id, cast({b} as bigint) as bucket,
           case when {b} < 90 then 'train' else 'val' end as split
    from documents
    """


def q_repetition_scores() -> str:
    return f"""
    with base as (
      select doc_id, greatest(len(string_split(text, ' ')) - 2, 0) as n_windows
      from documents
    ),
    dist as (
      select doc_id, count(*) as n_distinct from ({_SHINGLE3.format(where="")}) s
      group by doc_id
    )
    select b.doc_id,
           cast(b.n_windows as bigint) as n_windows,
           cast(coalesce(d.n_distinct, 0) as bigint) as n_distinct,
           case when b.n_windows > 0
                then round(1.0 - coalesce(d.n_distinct, 0) / cast(b.n_windows as double), 6)
                else 0.0 end as rep_ratio
    from base b left join dist d on d.doc_id = b.doc_id
    """


def q_unigram_nll() -> str:
    # corpus-trained unigram LM, fixed-K vocab (cnt desc, tok asc cut),
    # OOV one-count floor; identical arithmetic shape to the Spark
    # side: p = cnt/total as double, -ln(p), avg, round 6
    return """
    with tok as (
      select doc_id, tok from (
        select doc_id, unnest(string_split(text, ' ')) as tok from documents
      ) t where tok <> ''
    ),
    counts as (select tok, count(*) as cnt from tok group by tok),
    total as (select cast(sum(cnt) as double) as n from counts),
    vocab as (select tok, cnt from counts order by cnt desc, tok limit 1024),
    scored as (
      select t.doc_id,
             -ln(cast(coalesce(v.cnt, 1) as double) / (select n from total)) as nll
      from tok t left join vocab v on v.tok = t.tok
    )
    select doc_id,
           cast(count(*) as bigint) as n_tokens,
           round(avg(nll), 6) as mean_nll
    from scored group by doc_id
    """


def q_path_time_prune() -> str:
    # independent restatement: addresses rebuilt from first principles
    # (reverse-hour hex per pkg/upload/path_provider.go's unixYear4000
    # anchor), expected resolved_ts derived arithmetically — the Spark
    # side's hex parse must agree; the newer-than guard is the same
    # string range compare
    return """
    with ids as (select unnest(range(40)) as pos),
    minted as (
      select cast(pos as bigint) as pos,
             'data/t'
               || printf('%012x', 64060588800 - (1700000000 + pos*1800)//3600*3600)
               || '/' || md5(cast(pos as varchar)) as address,
             cast((1700000000 + pos*1800)//3600*3600 as bigint) as resolved_ts
      from ids
    ),
    legacy as (
      select cast(100 as bigint), 'data/ab/legacy0', cast(null as bigint)
      union all
      select cast(101 as bigint), 'other/x', cast(null as bigint)
    ),
    u as (select * from minted union all select * from legacy)
    select pos, address,
           -- bound widened one rotation: the cutoff's own hour counts
           -- as new (partition resolves only to the hour)
           (address >= 'data/t'
            and address < 'data/t'
                || printf('%012x',
                          64060588800 - ((1700000000 + 20*1800)//3600*3600 - 3600))
           ) as is_new,
           resolved_ts
    from u
    """


def q_bm25_topk() -> str:
    # BM25 (k1=1.2, b=0.75, Lucene's +0.5-smoothed idf) for the fixed
    # 4-term query; TF aggregated only over query-term tokens; rounded
    # scores make the top-20 cut engine-deterministic
    return """
    with tok as (
      select doc_id, tok from (
        select doc_id, unnest(string_split(text, ' ')) as tok from documents
      ) t where tok <> ''
    ),
    dl as (select doc_id, count(*) as dl from tok group by doc_id),
    tf as (
      select doc_id, tok, count(*) as tf from tok
      where tok in ('vector', 'hash', 'merge', 'query')
      group by doc_id, tok
    ),
    idf as (
      select tok,
             ln(1.0 + ((select count(*) from documents) - count(*) + 0.5)
                      / (count(*) + 0.5)) as idf
      from tf group by tok
    ),
    scored as (
      select tf.doc_id,
             sum(idf.idf * tf.tf * 2.2
                 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl
                                   / (select avg(dl) from dl)))) as s
      from tf join idf using (tok) join dl using (doc_id)
      group by tf.doc_id
    ),
    top as (
      select doc_id, round(s, 6) as score from scored
      order by score desc, doc_id limit 20
    )
    select cast(row_number() over (order by score desc, doc_id) as bigint) as rank,
           doc_id, score
    from top
    """


def q_hybrid_rerank() -> str:
    # BM25 top-50 -> Rocchio PRF query vector (mean of top-3 embeddings,
    # rounded 6dp BEFORE the dot, like prototypicality's centroids) ->
    # blend 0.5*bm25/max + 0.5*cosine, rounded 4dp, top-10 by
    # (final desc, doc_id)
    return """
    with tok as (
      select doc_id, tok from (
        select doc_id, unnest(string_split(text, ' ')) as tok from documents
      ) t where tok <> ''
    ),
    dl as (select doc_id, count(*) as dl from tok group by doc_id),
    tf as (
      select doc_id, tok, count(*) as tf from tok
      where tok in ('vector', 'hash', 'merge', 'query')
      group by doc_id, tok
    ),
    idf as (
      select tok,
             ln(1.0 + ((select count(*) from documents) - count(*) + 0.5)
                      / (count(*) + 0.5)) as idf
      from tf group by tok
    ),
    bscore as (
      select tf.doc_id,
             sum(idf.idf * tf.tf * 2.2
                 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl
                                   / (select avg(dl) from dl)))) as s
      from tf join idf using (tok) join dl using (doc_id)
      group by tf.doc_id
    ),
    ranked as (
      select doc_id, round(s, 6) as score,
             row_number() over (order by round(s, 6) desc, doc_id) as rank
      from bscore order by score desc, doc_id limit 50
    ),
    e as (
      select vec_id, cast(unnest(embedding) as double) as x,
             unnest(range(len(embedding))) as i
      from embeddings
    ),
    qv as (
      select e.i, round(avg(e.x), 6) as q
      from e join ranked r on r.doc_id = e.vec_id and r.rank <= 3
      group by e.i
    ),
    qn as (select sqrt(sum(q * q)) as nq from qv),
    cs as (
      select r.doc_id, r.score,
             sum(e.x * qv.q) as dot, sqrt(sum(e.x * e.x)) as ne
      from ranked r
      join e on e.vec_id = r.doc_id
      join qv on qv.i = e.i
      group by 1, 2
    ),
    m as (select max(score) as mx from ranked),
    fin as (
      select doc_id, score as bm25,
             round(dot / nullif(ne * (select nq from qn), 0), 6) as cosine,
             round(0.5 * score / (select mx from m)
                   + 0.5 * dot / nullif(ne * (select nq from qn), 0), 4) as final
      from cs
    )
    select cast(row_number() over (order by final desc, doc_id) as bigint) as rank,
           doc_id, bm25, cosine, final
    from fin order by final desc, doc_id limit 10
    """


def q_contamination() -> str:
    return f"""
    with tr as ({_SHINGLE3.format(where="where doc_id < 450")}),
    ev as (
      select distinct shingle from ({_SHINGLE3.format(where="where doc_id >= 450")}) e
    ),
    totals as (select doc_id, count(*) as n_sh from tr group by doc_id),
    hits as (
      select tr.doc_id, count(*) as n_hit
      from tr where exists (select 1 from ev where ev.shingle = tr.shingle)
      group by tr.doc_id
    )
    select t.doc_id,
           cast(t.n_sh as bigint) as n_sh,
           cast(coalesce(h.n_hit, 0) as bigint) as n_hit,
           round(coalesce(h.n_hit, 0) / cast(t.n_sh as double), 6) as contamination
    from totals t left join hits h on h.doc_id = t.doc_id
    """


def q_bloom_decontamination() -> str:
    # independent rebuild of the Bloom prefilter: same md5-affine hash
    # family, same 2^18-bit bitmap in 32-bit words, same k=3 bit tests;
    # candidates then verified against the exact eval shingle set
    from lakefs_spark.functions.hashfam import MERSENNE31, X_MOD, affine_constants

    m_bits = 1 << 18
    consts = affine_constants(3)
    base = "cast(concat('0x', substr(md5(shingle), 1, 15)) as bigint) % " + str(X_MOD)
    pos = [f"(({a} * x + {b}) % {MERSENNE31}) % {m_bits}" for a, b in consts]
    tests = " and ".join(
        f"(coalesce(w{i}.word, 0) & (1::bigint << cast(p{i} % 32 as int))) <> 0"
        for i in range(3)
    )
    return f"""
    with tr as ({_SHINGLE3.format(where="where doc_id < 450")}),
    ev as (
      select distinct shingle from ({_SHINGLE3.format(where="where doc_id >= 450")}) e
    ),
    evx as (select {base} as x from ev),
    bits as (select unnest([{", ".join(pos)}]) as pos from evx),
    words as (select pos // 32 as bucket,
                     bit_or(1::bigint << cast(pos % 32 as int)) as word
              from bits group by 1),
    probe as (
      select doc_id, shingle, {", ".join(f"p{i}" for i in range(3))}
      from (select doc_id, shingle,
                   {", ".join(f"{p} as p{i}" for i, p in enumerate(pos))}
            from (select doc_id, shingle, {base} as x from tr) b) q
    ),
    cand as (
      select probe.doc_id, probe.shingle from probe
      left join words w0 on probe.p0 // 32 = w0.bucket
      left join words w1 on probe.p1 // 32 = w1.bucket
      left join words w2 on probe.p2 // 32 = w2.bucket
      where {tests}
    ),
    totals as (select doc_id, count(*) as n_sh from tr group by doc_id),
    ncand as (select doc_id, count(*) as n_candidates from cand group by doc_id),
    nexact as (
      select doc_id, count(*) as n_exact from cand
      where exists (select 1 from ev where ev.shingle = cand.shingle)
      group by doc_id
    )
    select t.doc_id,
           cast(t.n_sh as bigint) as n_sh,
           cast(coalesce(c.n_candidates, 0) as bigint) as n_candidates,
           cast(coalesce(x.n_exact, 0) as bigint) as n_exact,
           round(coalesce(x.n_exact, 0) / cast(t.n_sh as double), 6) as contamination
    from totals t
    left join ncand c on c.doc_id = t.doc_id
    left join nexact x on x.doc_id = t.doc_id
    """


def q_doc_chunks() -> str:
    # overlapping 32-token windows every 24 tokens; the chunk count is
    # ceil((n_tok - size) / stride) + 1 floored at one, the last chunk
    # reaches the document end (list slicing truncates on both engines)
    return """
    with t as (
      select doc_id, string_split(text, ' ') as toks
      from documents where doc_id < 450
    ),
    n as (
      select doc_id, toks,
             greatest(cast(ceil((len(toks) - 32) / 24.0) as int) + 1, 1) as n_chunk
      from t
    ),
    c as (select doc_id, toks, unnest(range(0, n_chunk)) as chunk_idx from n)
    select doc_id,
           cast(chunk_idx as bigint) as chunk_idx,
           cast(len(toks[chunk_idx * 24 + 1 : chunk_idx * 24 + 32]) as bigint) as n_tokens,
           array_to_string(toks[chunk_idx * 24 + 1 : chunk_idx * 24 + 32], ' ') as chunk
    from c
    """


def q_stream_session_stats() -> str:
    # the streaming sessionizer's batch-invariance contract: its final
    # state must equal the batch gaps-and-islands sessions exactly
    return q_session_event_stats()


def q_corpus_funnel() -> str:
    # composed funnel over the training slice: each stage's predicate
    # compares the same ROUNDED values as the individual gated queries
    stage = (
        "select '{name}' as stage, cast(count(*) filter (where {cond}) as bigint) as n_docs, "
        "cast(coalesce(sum(n_toks) filter (where {cond}), 0) as bigint) as n_tokens from flags"
    )
    return f"""
    with t as (
      select doc_id, text, n_chars,
             cast(len(string_split(text, ' ')) as bigint) as n_toks
      from documents where doc_id < 450
    ),
    band as (select quantile_cont(n_chars, 0.05) as lo,
                    quantile_cont(n_chars, 0.95) as hi from t),
    q as (select doc_id,
                 round(length(regexp_replace(lower(text), '[^a-z]', '', 'g'))
                       / greatest(length(text), 1), 4) as alpha_ratio
          from t),
    base_rep as (select doc_id,
                        greatest(len(string_split(text, ' ')) - 2, 0) as n_windows
                 from t),
    dist as (select doc_id, count(*) as n_distinct
             from ({_SHINGLE3.format(where="where doc_id < 450")}) s group by doc_id),
    rep as (select b.doc_id,
                   case when b.n_windows > 0
                        then round(1.0 - coalesce(d.n_distinct, 0)
                                   / cast(b.n_windows as double), 6)
                        else 0.0 end as rep_ratio
            from base_rep b left join dist d on d.doc_id = b.doc_id),
    tr as ({_SHINGLE3.format(where="where doc_id < 450")}),
    ev as (select distinct shingle
           from ({_SHINGLE3.format(where="where doc_id >= 450")}) e),
    totals as (select doc_id, count(*) as n_sh from tr group by doc_id),
    hits as (select tr.doc_id, count(*) as n_hit from tr
             where exists (select 1 from ev where ev.shingle = tr.shingle)
             group by tr.doc_id),
    cont as (select tt.doc_id,
                    round(coalesce(h.n_hit, 0) / cast(tt.n_sh as double), 6) as contamination
             from totals tt left join hits h on h.doc_id = tt.doc_id),
    flags as (
      select t.doc_id, t.n_toks,
             (t.n_chars >= round(band.lo, 6) and t.n_chars <= round(band.hi, 6)) as s1,
             (t.n_chars >= round(band.lo, 6) and t.n_chars <= round(band.hi, 6))
               and q.alpha_ratio >= 0.75 as s2,
             (t.n_chars >= round(band.lo, 6) and t.n_chars <= round(band.hi, 6))
               and q.alpha_ratio >= 0.75
               and coalesce(rep.rep_ratio, 0.0) <= 0.2 as s3,
             (t.n_chars >= round(band.lo, 6) and t.n_chars <= round(band.hi, 6))
               and q.alpha_ratio >= 0.75
               and coalesce(rep.rep_ratio, 0.0) <= 0.2
               and coalesce(cont.contamination, 0.0) <= 0.05 as s4
      from t cross join band
      join q on q.doc_id = t.doc_id
      left join rep on rep.doc_id = t.doc_id
      left join cont on cont.doc_id = t.doc_id
    )
    {stage.format(name="s0_all", cond="true")}
    union all {stage.format(name="s1_length", cond="s1")}
    union all {stage.format(name="s2_quality", cond="s2")}
    union all {stage.format(name="s3_repetition", cond="s3")}
    union all {stage.format(name="s4_decontaminated", cond="s4")}
    """


def q_length_percentiles() -> str:
    # reuse the lang-id case ladder; quantile_cont == Spark percentile
    # (both exact linear interpolation at index p*(n-1))
    langs = list(STOPWORDS)
    scores = {lg: _sw_hits_sql("text", lg) for lg in langs}
    score_cols = ", ".join(f"{scores[lg]} as s_{lg}" for lg in langs)
    cases = []
    for i, lg in enumerate(langs):
        conds = [f"s_{lg} > 0"]
        for j, other in enumerate(langs):
            if j < i:
                conds.append(f"s_{lg} > s_{other}")
            elif j > i:
                conds.append(f"s_{lg} >= s_{other}")
        cases.append(f"when {' and '.join(conds)} then '{lg}'")
    case_sql = "case " + " ".join(cases) + " else 'unk' end"
    ps = [0.25, 0.5, 0.75, 0.9]
    parts = "\n    union all ".join(
        f"select lang_pred, cast({i} as bigint) as pos, round(quantile_cont(n, {p}), 6) as val "
        f"from t group by lang_pred"
        for i, p in enumerate(ps)
    )
    return f"""
    with t as (
      select {case_sql} as lang_pred, length(text) as n
      from (select text, {score_cols} from documents) s
    )
    {parts}
    """


def q_doc_fingerprints() -> str:
    return """
    select doc_id,
           md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) as fp
    from documents
    """


def q_ngram_jaccard() -> str:
    # word 3-gram shingles via list slicing; doc subset for pair count
    return """
    with toks as (
      select doc_id, string_split(text, ' ') as tk from documents where doc_id < 200
    ),
    sh as (
      select distinct doc_id, shingle from (
        select doc_id,
               unnest(list_transform(range(1, greatest(len(tk) - 1, 1)),
                                     i -> array_to_string(tk[i:i+2], ' '))) as shingle
        from toks
      ) x where shingle <> ''
    ),
    sizes as (select doc_id, count(*) as n_sh from sh group by doc_id),
    inter as (
      select a.doc_id as id_a, b.doc_id as id_b, count(*) as n_inter
      from sh a join sh b on a.shingle = b.shingle and a.doc_id < b.doc_id
      group by a.doc_id, b.doc_id
    )
    select id_a, id_b,
           round(n_inter / cast(sa.n_sh + sb.n_sh - n_inter as double), 4) as jaccard
    from inter
    join sizes sa on sa.doc_id = id_a
    join sizes sb on sb.doc_id = id_b
    where n_inter / cast(sa.n_sh + sb.n_sh - n_inter as double) >= 0.3
    """


def _minhash_ctes() -> str:
    # CTE chain of the md5-derived affine MinHash family
    # (functions/hashfam.py): num_hashes=32, bands=8 (4 rows/band),
    # 3-gram shingles, docs doc_id < 200; ends with ``cand`` = the
    # distinct candidate pairs
    from lakefs_spark.functions.hashfam import MERSENNE31, X_MOD, affine_constants

    consts = affine_constants(32)
    mins = ", ".join(
        f"min(({a} * x + {b}) % {MERSENNE31}) as m{i}" for i, (a, b) in enumerate(consts)
    )
    band_rows = []
    for band in range(8):
        ms = ", ".join(f"m{band * 4 + r}" for r in range(4))
        band_rows.append(
            f"select doc_id, {band} as band_id, concat_ws(',', {ms}) as bh from sigs"
        )
    bands_union = "\n      union all ".join(band_rows)
    return f"""toks as (
      select doc_id, string_split(text, ' ') as tk from documents where doc_id < 200
    ),
    sh as (
      select distinct doc_id, shingle from (
        select doc_id,
               unnest(list_transform(range(1, greatest(len(tk) - 1, 1)),
                                     i -> array_to_string(tk[i:i+2], ' '))) as shingle
        from toks
      ) x where shingle <> ''
    ),
    hashed as (
      select doc_id,
             cast(concat('0x', substr(md5(shingle), 1, 15)) as bigint) % {X_MOD} as x
      from sh
    ),
    sigs as (select doc_id, {mins} from hashed group by doc_id),
    bands as (
      {bands_union}
    ),
    cand as (
      select distinct a.doc_id as id_a, b.doc_id as id_b
      from bands a join bands b
        on a.band_id = b.band_id and a.bh = b.bh and a.doc_id < b.doc_id
    )"""


def _substring_dup_cte(n: int = 8, min_count: int = 2) -> str:
    """Shared CTEs for the exact-substring pass: duplicated window
    positions per doc — DuckDB list ops + window functions, a
    different implementation family from Spark's explode/transform."""
    return f"""
    d as (select doc_id, string_split(text, ' ') as toks from documents),
    w as (
      select doc_id, i - 1 as pos,
             array_to_string(list_slice(toks, i, i + {n - 1}), ' ') as wtext
      from d, unnest(generate_series(1, greatest(len(toks) - {n} + 1, 0))) as t(i)
    ),
    dup as (
      select doc_id, pos from (
        select doc_id, pos, count(*) over (partition by wtext) as n_occ from w
      ) where n_occ >= {min_count}
    ),
    runs as (
      select doc_id, pos,
             sum(case when prev is null or pos - prev > {n} then 1 else 0 end)
               over (partition by doc_id order by pos rows unbounded preceding) as run_id
      from (select doc_id, pos,
                   lag(pos) over (partition by doc_id order by pos) as prev
            from dup)
    ),
    spans as (
      select doc_id,
             cast(min(pos) as bigint) as start_tok,
             cast(max(pos) + {n} as bigint) as end_tok,
             cast(max(pos) + {n} - min(pos) as bigint) as span_tokens
      from runs group by doc_id, run_id
    )"""


def q_substring_spans() -> str:
    return f"""
    with {_substring_dup_cte()}
    select doc_id, start_tok, end_tok, span_tokens from spans
    """


def q_substring_stats() -> str:
    return f"""
    with {_substring_dup_cte()},
    per_doc as (
      select doc_id, cast(count(*) as bigint) as n_spans,
             cast(sum(span_tokens) as bigint) as dup_tokens
      from spans group by doc_id
    ),
    totals as (
      select doc_id, cast(len(string_split(text, ' ')) as bigint) as total_tokens
      from documents
    )
    select t.doc_id,
           coalesce(p.n_spans, 0) as n_spans,
           coalesce(p.dup_tokens, 0) as dup_tokens,
           t.total_tokens,
           round(coalesce(p.dup_tokens, 0) / cast(t.total_tokens as double), 6) as dup_ratio
    from totals t left join per_doc p using (doc_id)
    """


def q_substring_cut() -> str:
    # relational restatement of the cut: explode (token, pos) with
    # ordinality, left-join to the disjoint spans (no fan-out), keep
    # unmatched, reassemble ordered — a different family from Spark's
    # array filter/exists
    return f"""
    with {_substring_dup_cte()},
    base as (select doc_id, string_split(text, ' ') as toks from documents),
    tokpos as (
      select b.doc_id, b.toks[i] as tok, i - 1 as pos
      from base b, unnest(generate_series(1, len(b.toks))) as t(i)
    ),
    kept as (
      select tp.doc_id, tp.tok, tp.pos
      from tokpos tp left join spans s
        on s.doc_id = tp.doc_id and tp.pos >= s.start_tok and tp.pos < s.end_tok
      where s.doc_id is null
    ),
    reassembled as (
      select doc_id,
             array_to_string(list(tok order by pos), ' ') as clean_text,
             cast(count(*) as bigint) as n_kept
      from kept group by doc_id
    )
    select b.doc_id,
           coalesce(r.clean_text, '') as clean_text,
           coalesce(r.n_kept, 0) as n_kept,
           cast(len(b.toks) - coalesce(r.n_kept, 0) as bigint) as n_removed
    from base b left join reassembled r using (doc_id)
    """


def q_minhash_candidates() -> str:
    return f"with {_minhash_ctes()}\nselect id_a, id_b from cand"


def q_incremental_dedup_pairs() -> str:
    # the incremental candidate set IS the all-pairs candidate set
    # restricted to pairs touching a diff-derived doc: restate via
    # cand + the same portable-hash touched mapping the text gate uses
    from lakefs_spark.functions.hashfam import X_MOD

    return with_views("snap_a", "snap_b") + f"""
    , d as ({diff_sql("snap_a", "snap_b")}),
    touched as (
      select distinct
             (cast(concat('0x', substr(md5(key), 1, 15)) as bigint) % {X_MOD}) % 500 as doc_id
      from d
    ),
    {_minhash_ctes()}
    select id_a, id_b from cand
    where id_a in (select doc_id from touched)
       or id_b in (select doc_id from touched)
    """


def q_dedup_clusters() -> str:
    # transitive-closure minimum per node over the undirected candidate
    # graph — an independent restatement of min-label propagation's
    # fixpoint
    return f"""
    with recursive {_minhash_ctes()},
    edges as (
      select id_a as u, id_b as v from cand
      union all
      select id_b, id_a from cand
    ),
    reach(node, r) as (
      select u, u from (select distinct u from edges) n
      union
      select e.u, reach.r from edges e join reach on reach.node = e.v
    )
    select node as member, min(r) as rep from reach group by node
    """


def q_dedup_survivors() -> str:
    # the composed pipeline: candidates -> transitive-closure clusters
    # -> drop non-representatives -> per-language survivor stats
    return f"""
    with recursive {_minhash_ctes()},
    edges as (
      select id_a as u, id_b as v from cand
      union all
      select id_b, id_a from cand
    ),
    reach(node, r) as (
      select u, u from (select distinct u from edges) n
      union
      select e.u, reach.r from edges e join reach on reach.node = e.v
    ),
    reps as (select node as member, min(r) as rep from reach group by node),
    dropped as (select member as doc_id from reps where member <> rep)
    select lang, cast(count(*) as bigint) as n_docs,
           cast(sum(len(string_split(text, ' '))) as bigint) as n_tokens
    from documents d
    where d.doc_id < 200
      and not exists (select 1 from dropped x where x.doc_id = d.doc_id)
    group by lang
    """


def _simhash_body(source: str) -> str:
    """CTE chain computing (doc_id, simhash) over ``source`` — the
    relational restatement of operators/dedup.simhash, shared by the
    signature and the near-dup oracles."""
    digit_cols = ", ".join(
        f"strpos('0123456789abcdef', substr(hx, {j + 1}, 1)) - 1 as d{j}"
        for j in range(16)
    )
    bit_sums = ", ".join(
        f"sum(case when (d{i // 4} >> {i % 4}) & 1 = 1 then 1 else -1 end) as b{i}"
        for i in range(64)
    )
    weights = [
        f"case when b{i} > 0 then cast({2**i if i < 63 else -(2**63)} as bigint) else cast(0 as bigint) end"
        for i in range(64)
    ]
    sig = " + ".join(weights)
    return f"""
    toks as (
      select doc_id, tok from (
        select doc_id, unnest(string_split(text, ' ')) as tok from {source}
      ) t where tok <> ''
    ),
    digits as (select doc_id, {digit_cols} from (select doc_id, md5(tok) as hx from toks) h),
    sums as (select doc_id, {bit_sums} from digits group by doc_id),
    sigs as (select doc_id, {sig} as simhash from sums)
    """


def q_simhash() -> str:
    # 64-bit simhash from md5 hex digits, 4 bits/digit (operators/dedup
    # .simhash): per-bit +-1 vote over the doc's tokens, sign -> bit
    return f"""
    with {_simhash_body("documents")}
    select doc_id, simhash from sigs
    """


def q_simhash_near_dups() -> str:
    # probe corpus = documents plus near-copies (one token appended) so
    # the banded candidate join has true positives to find; band values
    # use (sig >> s) & mask, fill-independent on two's-complement longs
    return f"""
    with probe as (
      select doc_id, text from documents
      union all
      select doc_id + 10000, text || ' extra' from documents where doc_id < 50
    ),
    {_simhash_body("probe")},
    bv as (
      select doc_id, simhash, u.b,
             (simhash >> (u.b * 16)) & 65535 as band_val
      from sigs, unnest([0, 1, 2, 3]) as u(b)
    ),
    cand as (
      select distinct x.doc_id as id_a, y.doc_id as id_b,
             x.simhash as sa, y.simhash as sb
      from bv x join bv y
        on x.b = y.b and x.band_val = y.band_val and x.doc_id < y.doc_id
    )
    select id_a, id_b, cast(bit_count(xor(sa, sb)) as bigint) as hamming
    from cand
    where bit_count(xor(sa, sb)) <= 8
    """


# -- similarity ------------------------------------------------------------


def q_cosine_pairs() -> str:
    return """
    select qa, qb, round(s_ab / (sqrt(s_aa) * sqrt(s_bb)), 4) as sim
    from (
      select qa, qb, sum(xa * xb) as s_ab, sum(xa * xa) as s_aa, sum(xb * xb) as s_bb
      from (
        select a.vec_id as qa, b.vec_id as qb,
               cast(unnest(a.embedding) as double) as xa,
               cast(unnest(b.embedding) as double) as xb
        from embeddings a join embeddings b on a.vec_id < b.vec_id
        where a.vec_id < 8
      ) z group by qa, qb
    ) s
    """


def q_near_dup_embeddings() -> str:
    # embedding-cosine near-duplicate pairs over the full table;
    # qa/qb only (sim values are float-rounding-sensitive cross-engine)
    return """
    select qa, qb
    from (
      select qa, qb, sum(xa * xb) as s_ab, sum(xa * xa) as s_aa, sum(xb * xb) as s_bb
      from (
        select a.vec_id as qa, b.vec_id as qb,
               cast(unnest(a.embedding) as double) as xa,
               cast(unnest(b.embedding) as double) as xb
        from embeddings a join embeddings b on a.vec_id < b.vec_id
      ) z group by qa, qb
    ) s
    where s_ab / (sqrt(s_aa) * sqrt(s_bb)) >= 0.35
    """


def q_embedding_dedup_survivors() -> str:
    # keep-one over the near-dup pair graph: transitive-closure min per
    # component (independent restatement of the engine's union-find /
    # min-label propagation fixpoint), survivors = everything that is
    # not a non-representative member
    return """
    with recursive cand as (
      select qa, qb
      from (
        select qa, qb, sum(xa * xb) as s_ab, sum(xa * xa) as s_aa, sum(xb * xb) as s_bb
        from (
          select a.vec_id as qa, b.vec_id as qb,
                 cast(unnest(a.embedding) as double) as xa,
                 cast(unnest(b.embedding) as double) as xb
          from embeddings a join embeddings b on a.vec_id < b.vec_id
        ) z group by qa, qb
      ) s
      where s_ab / (sqrt(s_aa) * sqrt(s_bb)) >= 0.35
    ),
    edges as (
      select qa as u, qb as v from cand
      union all
      select qb, qa from cand
    ),
    reach(node, r) as (
      select u, u from (select distinct u from edges) n
      union
      select e.u, reach.r from edges e join reach on reach.node = e.v
    ),
    reps as (select node as member, min(r) as rep from reach group by node),
    dropped as (select member from reps where member <> rep)
    select vec_id from embeddings
    where vec_id not in (select member from dropped)
    """


def q_ann_topk() -> str:
    # exact brute-force top-5 per query (vec_id < 8), self excluded;
    # rank omitted from the contract (row order within float-noise ties
    # is engine-specific; membership + sim@4dp is not)
    return """
    select qa, qb, round(s_ab / (sqrt(s_aa) * sqrt(s_bb)), 4) as sim
    from (
      select qa, qb, sum(xa * xb) as s_ab, sum(xa * xa) as s_aa, sum(xb * xb) as s_bb
      from (
        select a.vec_id as qa, b.vec_id as qb,
               cast(unnest(a.embedding) as double) as xa,
               cast(unnest(b.embedding) as double) as xb
        from embeddings a join embeddings b on a.vec_id <> b.vec_id
        where a.vec_id < 8
      ) z group by qa, qb
    ) s
    qualify row_number() over (partition by qa order by s_ab / (sqrt(s_aa) * sqrt(s_bb)) desc, qb) <= 5
    """


def q_ann_recall() -> str:
    # recall@5 of the LSH top-k vs brute force, composed from the two
    # gated definitions (their determinism is already driver-verified)
    return f"""
    select e.qa, cast(count(l.qa) as bigint) as n_hits,
           round(count(l.qa) / 5.0, 6) as recall
    from ({q_ann_topk()}) e
    left join ({q_lsh_topk()}) l on e.qa = l.qa and e.qb = l.qb
    group by e.qa
    """


def _plane_values_sql(dim: int, n_planes: int, seed: int = 42) -> str:
    """VALUES rows (j, p0..p{n-1}) of the deterministic LSH hyperplanes
    (operators/similarity._hyperplane) — full-precision repr round-trips
    exactly into DuckDB doubles."""
    from lakefs_spark.operators.similarity import _hyperplane

    planes = [_hyperplane(dim, seed, p) for p in range(n_planes)]
    rows = []
    for j in range(dim):
        vals = ", ".join(repr(planes[p][j]) for p in range(n_planes))
        rows.append(f"({j + 1}, {vals})")
    return ",\n      ".join(rows)


def q_lsh_topk() -> str:
    n_planes = 6
    cols = ", ".join(f"p{p}" for p in range(n_planes))
    dots = ", ".join(
        f"sum(cast(e.embedding[pl.j] as double) * pl.p{p}) as s{p}" for p in range(n_planes)
    )
    bits = " || ".join(
        f"(case when s{p} >= 0 then '1' else '0' end)" for p in range(n_planes)
    )
    return f"""
    with planes (j, {cols}) as (values
      {_plane_values_sql(64, n_planes)}
    ),
    buckets as (
      select vec_id, {bits} as bucket from (
        select e.vec_id, {dots}
        from embeddings e join planes pl on true
        group by e.vec_id
      ) d
    ),
    pairs as (
      select qa.vec_id as qa, cb.vec_id as qb
      from buckets qa join buckets cb
        on qa.bucket = cb.bucket and qa.vec_id <> cb.vec_id
      where qa.vec_id < 8
    )
    select qa, qb, round(s_ab / (sqrt(s_aa) * sqrt(s_bb)), 4) as sim
    from (
      select qa, qb, sum(xa * xb) as s_ab, sum(xa * xa) as s_aa, sum(xb * xb) as s_bb
      from (
        select p.qa, p.qb,
               cast(unnest(ea.embedding) as double) as xa,
               cast(unnest(eb.embedding) as double) as xb
        from pairs p
        join embeddings ea on ea.vec_id = p.qa
        join embeddings eb on eb.vec_id = p.qb
      ) z group by qa, qb
    ) s
    qualify row_number() over (partition by qa order by s_ab / (sqrt(s_aa) * sqrt(s_bb)) desc, qb) <= 5
    """


def q_kmeans_codebook() -> str:
    # two spherical Lloyd steps restated relationally: assignment =
    # argmax_c dot(v,c)/||c|| (tie: min cid), new centroid = per-dim
    # mean of members, empty cluster keeps its previous centroid.
    # dims are joined positionally via range(1,65) (1-based lists).
    return """
    with cents0 as (
      select vec_id as cid, embedding as cv from embeddings where vec_id in (select vec_id from embeddings
        order by md5(cast(vec_id as varchar)), vec_id limit 25)
    ),
    score1 as (
      select va, cid, s_ab / sqrt(s_cc) as score from (
        select a.vec_id as va, c.cid,
               sum(cast(a.embedding[r.j] as double) * cast(c.cv[r.j] as double)) as s_ab,
               sum(cast(c.cv[r.j] as double) * cast(c.cv[r.j] as double)) as s_cc
        from embeddings a
        cross join range(1, 65) r(j)
        join cents0 c on true
        group by a.vec_id, c.cid
      ) s
    ),
    assign1 as (
      select va, cid from (
        select va, cid, row_number() over (partition by va order by score desc, cid) as rn
        from score1
      ) t where rn = 1
    ),
    means1 as (
      select s.cid, r.j, avg(cast(e.embedding[r.j] as double)) as val
      from assign1 s
      join embeddings e on e.vec_id = s.va
      cross join range(1, 65) r(j)
      group by s.cid, r.j
    ),
    cents1 as (
      select c.cid, r.j,
             coalesce(m.val, cast(c.cv[r.j] as double)) as val
      from cents0 c
      cross join range(1, 65) r(j)
      left join means1 m on m.cid = c.cid and m.j = r.j
    ),
    norm1 as (select cid, sqrt(sum(val * val)) as nrm from cents1 group by cid),
    score2 as (
      select va, cid, s_ab / nrm as score from (
        select a.vec_id as va, c1.cid, sum(cast(a.embedding[c1.j] as double) * c1.val) as s_ab
        from embeddings a join cents1 c1 on true
        group by a.vec_id, c1.cid
      ) s join norm1 using (cid)
    ),
    assign2 as (
      select va, cid from (
        select va, cid, row_number() over (partition by va order by score desc, cid) as rn
        from score2
      ) t where rn = 1
    ),
    means2 as (
      select s.cid, r.j, avg(cast(e.embedding[r.j] as double)) as val
      from assign2 s
      join embeddings e on e.vec_id = s.va
      cross join range(1, 65) r(j)
      group by s.cid, r.j
    )
    select c1.cid, cast(c1.j - 1 as bigint) as dim,
           round(coalesce(m.val, c1.val), 6) as val
    from cents1 c1
    left join means2 m on m.cid = c1.cid and m.j = c1.j
    """


def q_ivf_topk() -> str:
    # Independent IVF restatement: codebook = fixed-K hash-ranked sample (md5 order, K=25); assign
    # each vector to its max-cosine centroid (tie: min cid); queries
    # probe their 3 nearest centroids; exact top-5 rerank inside the
    # probed inverted lists. Membership set only (rank order is
    # float-sum-order sensitive cross-engine; membership is not).
    return """
    with cent as (select vec_id, embedding from embeddings where vec_id in (select vec_id from embeddings
        order by md5(cast(vec_id as varchar)), vec_id limit 25)),
    cent_sims as (
      select va, cid, s_ab / (sqrt(s_aa) * sqrt(s_bb)) as sim from (
        select va, cid, sum(xa * xb) as s_ab, sum(xa * xa) as s_aa, sum(xb * xb) as s_bb
        from (
          select a.vec_id as va, c.vec_id as cid,
                 cast(unnest(a.embedding) as double) as xa,
                 cast(unnest(c.embedding) as double) as xb
          from embeddings a join cent c on true
        ) z group by va, cid
      ) s
    ),
    assign as (
      select va as qb, cid from (
        select va, cid, row_number() over (partition by va order by sim desc, cid) as rn
        from cent_sims
      ) t where rn = 1
    ),
    probes as (
      select va as qa, cid from (
        select va, cid, row_number() over (partition by va order by sim desc, cid) as rn
        from cent_sims where va < 8
      ) t where rn <= 3
    ),
    cand as (
      select distinct p.qa, a.qb from probes p join assign a on a.cid = p.cid
      where a.qb <> p.qa
    ),
    cand_sims as (
      select qa, qb, s_ab / (sqrt(s_aa) * sqrt(s_bb)) as sim from (
        select qa, qb, sum(xa * xb) as s_ab, sum(xa * xa) as s_aa, sum(xb * xb) as s_bb
        from (
          select c.qa, c.qb,
                 cast(unnest(ea.embedding) as double) as xa,
                 cast(unnest(eb.embedding) as double) as xb
          from cand c
          join embeddings ea on ea.vec_id = c.qa
          join embeddings eb on eb.vec_id = c.qb
        ) z group by qa, qb
      ) s
    )
    select qa, qb from (
      select qa, qb, row_number() over (partition by qa order by sim desc, qb) as rn
      from cand_sims
    ) t where rn <= 5
    """


# -- import / export / misc -------------------------------------------------


IMPORT_PREFIX = "tables/orders/b3/"
IMPORT_PREFIX_UPPER = "tables/orders/b30"  # upper_bound_for_prefix


def q_import_prefix_replace() -> str:
    p, pu = IMPORT_PREFIX, IMPORT_PREFIX_UPPER
    return with_views("entries", "snap_b") + f"""
    select key, identity, address, size, etag from entries
    where not (key >= '{p}' and key < '{pu}')
    union all
    select key, identity, address, size, etag from snap_b
    where key >= '{p}' and key < '{pu}'
    """


def q_symlink_manifest() -> str:
    return with_views("entries") + """
    select regexp_replace(key, '/[^/]*$', '') as dir,
           count(*) as n_objects,
           string_agg(address, chr(10) order by address) as content
    from entries
    group by regexp_replace(key, '/[^/]*$', '')
    """


def q_hive_partitions() -> str:
    return with_views("entries") + """
    select substring(sfx, 1, instr(sfx, '/') - 1) as part_value,
           count(*) as n_objects,
           cast(sum(coalesce(size, 0)) as bigint) as total_size
    from (select substring(key, 15, 1000000) as sfx, size
          from entries where key like 'tables/orders/%') t
    where instr(sfx, '/') > 0
    group by 1
    """


def q_tombstone_alert_stream() -> str:
    # batch-invariant sensor contract: crossings summed over the alert
    # stream == floor(total tombstones / threshold) per branch; branches
    # that never reach the threshold emit nothing
    return """
    with c as (
      select concat('b', cast(user_id % 3 as varchar)) as branch,
             case when event_id % 4 = 0 then 1 else 0 end as tomb
      from events where event_id % 5 = 0
    )
    select branch,
           cast(floor(sum(tomb) / 40.0) as bigint) as n_crossings,
           cast(40 as bigint) as threshold
    from c group by branch
    having sum(tomb) >= 40
    """


def q_csv_source() -> str:
    # round-trip contract: the CSV export + schema-read reproduces the
    # table byte-for-byte (no inference, no loss)
    return "select doc_id, lang, text from documents"


def q_json_source() -> str:
    return "select doc_id, lang, text from documents"


def q_orc_source() -> str:
    # DuckDB has no ORC reader: the oracle is the source-of-truth
    # projection; the Spark side must reproduce it through the ORC
    # write+read round trip losslessly
    return "select doc_id, lang, text from documents"


def q_binary_file_source() -> str:
    # binaryFile ingestion of opaque objects: name, size, payload md5
    return """
    select concat('doc_', lpad(cast(doc_id as varchar), 5, '0'), '.bin') as name,
           cast(length(text) as bigint) as n_bytes,
           md5(text) as payload_md5
    from documents where doc_id < 20
    """


def q_stream_dedup_hashes() -> str:
    # the emitted set is exactly the distinct content hashes
    return "select distinct md5(text) as fp from documents"


def q_packing_efficiency() -> str:
    # extends the greedy-packing replay with per-shard rollup
    return """
    with recursive d as (
      select doc_id, doc_id % 8 as shard,
             cast(len(string_split(text, ' ')) as bigint) as n_tokens,
             row_number() over (partition by doc_id % 8 order by doc_id) as rn
      from documents
    ),
    acc as (
      select shard, rn, doc_id, n_tokens, n_tokens as seq_fill, cast(0 as bigint) as seq_id
      from d where rn = 1
      union all
      select d.shard, d.rn, d.doc_id, d.n_tokens,
             case when a.seq_fill + d.n_tokens > 512 then d.n_tokens
                  else a.seq_fill + d.n_tokens end,
             case when a.seq_fill + d.n_tokens > 512 then a.seq_id + 1 else a.seq_id end
      from acc a join d on d.shard = a.shard and d.rn = a.rn + 1
    )
    select cast(shard as bigint) as shard,
           cast(max(seq_id) + 1 as bigint) as n_seqs,
           cast(sum(n_tokens) as bigint) as total_tokens,
           round(sum(n_tokens) / ((max(seq_id) + 1) * 512.0), 6) as fill_efficiency
    from acc group by shard
    """


def q_delta_log_actions() -> str:
    # the written log's add actions restated: one per object, size
    # coalesced to 0 (export.py add-action construction)
    return with_views("entries") + """
    select address as path, cast(coalesce(size, 0) as bigint) as size
    from entries
    """


def q_glue_partition_batches() -> str:
    # partition inventory under tables/orders/, ordered by value and
    # chunked at the Glue BatchCreatePartition 100-input cap
    return with_views("entries") + """
    , parts as (
      select substring(sfx, 1, instr(sfx, '/') - 1) as part_value
      from (select substring(key, 15, 1000000) as sfx
            from entries where key like 'tables/orders/%') t
      where instr(sfx, '/') > 0
      group by 1
    ),
    ordered as (
      select part_value, row_number() over (order by part_value) - 1 as rn
      from parts
    )
    select cast(rn // 100 as bigint) as batch_idx,
           cast(rn % 100 as bigint) as pos,
           part_value,
           concat('s3://bucket/orders/', part_value, '/') as location
    from ordered
    """


def q_unity_table_payload() -> str:
    return with_views("entries") + """
    select 'orders' as name, 'EXTERNAL' as table_type, 'DELTA' as data_source_format,
           's3://bucket/orders/' as storage_location,
           cast(count(*) as bigint) as n_objects,
           cast(sum(coalesce(size, 0)) as bigint) as n_bytes
    from entries
    """


def q_media_features() -> str:
    # the stub decoder's features are the first 16 md5 digest bytes of
    # the payload scaled to [0,1]; payload bytes == UTF-8 of text, so
    # DuckDB's md5(varchar) reproduces them exactly (exact division)
    return """
    with m as (
      select doc_id as media_id, 'video' as kind, md5(text) as h
      from documents where doc_id % 3 = 0
    ),
    d as (select unnest(range(16)) as j)
    select media_id, kind, cast(j as bigint) as dim,
           cast(concat('0x', substr(h, j*2 + 1, 2)) as bigint) / 255.0 as value
    from m, d
    """


def q_media_frame_sample() -> str:
    # videos = every 3rd document; duration derived from n_chars;
    # sample timestamps every 500 ms, inclusive of 0 and duration
    return """
    select media_id, cast(ts_ms as bigint) as ts_ms from (
      select doc_id as media_id,
             unnest(generate_series(0, 1000 + (n_chars % 5) * 500, 500)) as ts_ms
      from documents where doc_id % 3 = 0
    ) t
    """


def q_audio_chunks() -> str:
    # mirror of __spark_entry__.q_audio_chunks: hop-strided windows
    # (window=2000 hop=1000) fully inside duration; short clips clamp
    # to one [0, duration) chunk; samples = floor(ms*rate/1000)
    return """
    with clips as (
      select doc_id as media_id,
             8000 + (n_chars % 5) * 4100 as sample_rate,
             1200 + (n_chars % 7) * 800 as duration_ms
      from documents where doc_id % 3 = 1
    ), chunks as (
      select media_id, sample_rate, duration_ms,
             unnest(generate_series(0,
               case when duration_ms >= 2000
                    then cast(floor((duration_ms - 2000) / 1000.0) as bigint)
                    else 0 end)) as chunk_idx
      from clips
    )
    select media_id, chunk_idx,
           chunk_idx * 1000 as start_ms,
           least(chunk_idx * 1000 + 2000, duration_ms) as end_ms,
           cast(floor(chunk_idx * 1000 * sample_rate / 1000.0) as bigint) as start_sample,
           cast(floor(least(chunk_idx * 1000 + 2000, duration_ms) * sample_rate / 1000.0) as bigint) as end_sample
    from chunks
    """


def q_media_resize() -> str:
    # aspect-preserving fit of (200+(id%7)*100, 150+(id%5)*120) into
    # 512x384: scale = min(512/w, 384/h, 1), floored dims (min 1)
    return """
    select media_id,
           cast(greatest(floor(w * s), 1) as int) as out_w,
           cast(greatest(floor(h * s), 1) as int) as out_h,
           s < 1.0 as resized
    from (
      select doc_id as media_id, w, h,
             least(512.0 / w, 384.0 / h, 1.0) as s
      from (
        select doc_id,
               cast(200 + (doc_id % 7) * 100 as double) as w,
               cast(150 + (doc_id % 5) * 120 as double) as h
        from documents where doc_id % 3 = 1
      ) b
    ) t
    """


def q_gc_key_match() -> str:
    return with_views("staged_active") + """
    select key from staged_active where regexp_matches(key, 'b[13]/')
    """


POINT_KEY = "tables/orders/b3/000000000017"


def q_usage_report() -> str:
    return """
    select cast(cast(ts as date) as varchar) as day, event_type, count(*) as n
    from events group by 1, 2
    """


def q_multipart_etags() -> str:
    # Hex-string fold of the per-part md5s (DuckDB cannot md5 a BLOB);
    # byte-level S3 semantics are pinned by tests/test_checksum.py.
    return """
    select l_orderkey as okey,
           md5(string_agg(pmd5, '' order by l_linenumber, pmd5))
             || '-' || cast(count(*) as varchar) as etag
    from (
      select l_orderkey, l_linenumber,
             md5(concat_ws('|', l_orderkey, l_linenumber)) as pmd5
      from lineitem where l_orderkey % 50 = 0
    ) parts
    group by l_orderkey
    """


def q_point_lookup() -> str:
    return with_views("snap_a") + f"""
    select key, identity, address, size, etag from snap_a where key = '{POINT_KEY}'
    """


def q_uncommitted_addresses() -> str:
    return with_views("staged_all") + """
    select distinct address from staged_all
    where is_tombstone = false and address is not null
    """


def q_range_join_acctbal() -> str:
    # independent restatement: plain inequality join (fine at oracle
    # scale; the Spark side must NOT plan this shape — see test_plans)
    return """
    select s.s_suppkey, c.c_custkey, c.c_nationkey as nationkey
    from customer c join supplier s
      on c.c_nationkey = s.s_nationkey
     and c.c_acctbal between s.s_acctbal and s.s_acctbal + 500.0
    """


def q_asof_click_attribution() -> str:
    # DuckDB's native ASOF LEFT JOIN — an independent implementation of
    # the same point-in-time semantics (inclusive: click_ts <= purchase_ts)
    return """
    with p as (
      select event_id as purchase_id, user_id, ts from events
      where event_type = 'purchase'
    ),
    c as (
      select user_id, ts, max(event_id) as click_id from events
      where event_type = 'click' group by user_id, ts
    )
    select p.purchase_id, p.user_id,
           cast(floor(epoch_us(p.ts) / 1000000) as bigint) as purchase_ts_s,
           coalesce(c.click_id, -1) as click_id,
           coalesce(cast(floor(epoch_us(c.ts) / 1000000) as bigint), -1) as click_ts_s
    from p asof left join c on p.user_id = c.user_id and p.ts >= c.ts
    """


def q_event_time_rollup() -> str:
    # independent restatement: union of the two grains computed
    # separately (the Spark side must do it in ONE grouping-sets pass)
    return """
    select strftime(ts, '%Y-%m-%d') as day, '' as hour,
           'day' as grain, count(*) as n_events, round(sum(value), 4) as total_value
    from events group by 1
    union all
    select strftime(ts, '%Y-%m-%d'), strftime(ts, '%H'),
           'hour', count(*), round(sum(value), 4)
    from events group by 1, 2
    """


def q_sliding_event_counts() -> str:
    # each event belongs to exactly two 10-min windows on a 5-min hop:
    # starts floor(s/300)*300 and that minus 300 (second-aligned
    # boundaries make the seconds-level floor exact against micros ts)
    return """
    select ws as window_start_s, ws + 600 as window_end_s, event_type,
           count(*) as n_events, round(sum(value), 4) as total_value
    from (
      select event_type, value,
             unnest(generate_series(
               cast(floor(epoch(ts) / 300) - 1 as bigint) * 300,
               cast(floor(epoch(ts) / 300) as bigint) * 300,
               300)) as ws
      from events
    ) t
    group by ws, event_type
    """


def q_session_event_stats() -> str:
    # gaps-and-islands in exact MICROSECONDS (Spark session windows use
    # full ts precision; a seconds-level restatement diverges near
    # 30min-boundary gaps, and epoch()'s double->bigint cast ROUNDS
    # where Spark's timestamp->long cast truncates). An event exactly
    # gap after its predecessor starts a NEW session (window end is
    # exclusive) -> new_sess on diff >= gap. Final epochs floor to
    # seconds like the Spark side's cast.
    return """
    with e as (
      select user_id, epoch_us(ts) as us, value from events
    ),
    flagged as (
      select user_id, us, value,
             case when us - lag(us) over (partition by user_id order by us) >= 1800000000
                    or lag(us) over (partition by user_id order by us) is null
                  then 1 else 0 end as new_sess
      from e
    ),
    islands as (
      select user_id, us, value,
             sum(new_sess) over (partition by user_id order by us
                                 rows between unbounded preceding and current row) as sess
      from flagged
    )
    select user_id,
           cast(floor(min(us) / 1000000) as bigint) as session_start_s,
           cast(floor(max(us) / 1000000) as bigint) + 1800 as session_end_s,
           count(*) as n_events,
           round(sum(value), 4) as total_value
    from islands
    group by user_id, sess
    """


def q_windowed_event_counts() -> str:
    # 10-minute tumbling windows, epoch-aligned like Spark's window()
    return """
    select cast(floor(epoch(ts) / 600) * 600 as bigint) as window_start_s,
           cast(floor(epoch(ts) / 600) * 600 + 600 as bigint) as window_end_s,
           event_type,
           count(*) as n_events,
           round(sum(value), 4) as total_value
    from events
    group by 1, 2, 3
    """


# -- commit DAG (recursive-CTE oracles) ------------------------------------
#
# The commit-graph operators (SURVEY §2.9) are verified over the shared
# deterministic DAG in sources/dagspec.py: Spark runs the real
# storage.refs algorithms over a CommitStore; here the same DAG is
# re-derived inside SQL and the semantics are recomputed independently
# with recursive CTEs (the reference calls these its "recursive
# queries" — pkg/graveler/ref/commit_iterator.go, merge_base_finder.go).


def _dag_prefix() -> str:
    from lakefs_spark.sources.dagspec import dag_nodes_sql

    return "with recursive " + dag_nodes_sql().lstrip() + ",\n"


def q_commit_log() -> str:
    from lakefs_spark.sources.dagspec import LOG_HEAD

    # Log = all ancestors of head, emitted by (creation_date desc,
    # commit_id); dates are strictly increasing with the index, so that
    # order is index-descending (dagspec docstring).
    return _dag_prefix() + f"""
    anc(node) as (
      select {LOG_HEAD}
      union
      select e.parent from anc join edges e on e.child = anc.node
    )
    select row_number() over (order by d.ts desc, d.cid) as pos,
           d.cid as commit_id,
           cast(d.ts as bigint) as creation_ts
    from anc join dag d on d.i = anc.node
    """


def q_commit_log_since() -> str:
    from lakefs_spark.sources.dagspec import DATE0, DATE_STEP, LOG_HEAD, LOG_SINCE_IDX

    # since-filter drops too-old commits but keeps walking their
    # parents (commit_iterator.go) — on the full ancestor set that is a
    # plain post-filter.
    since = DATE0 + LOG_SINCE_IDX * DATE_STEP
    return _dag_prefix() + f"""
    anc(node) as (
      select {LOG_HEAD}
      union
      select e.parent from anc join edges e on e.child = anc.node
    )
    select row_number() over (order by d.ts desc, d.cid) as pos,
           d.cid as commit_id,
           cast(d.ts as bigint) as creation_ts
    from anc join dag d on d.i = anc.node
    where d.ts >= {since}
    """


def q_commit_log_first_parent() -> str:
    from lakefs_spark.sources.dagspec import LOG_HEAD

    return _dag_prefix() + f"""
    fpl(node) as (
      select {LOG_HEAD}
      union all
      select d.parent1 from fpl join dag d on d.i = fpl.node
      where d.parent1 is not null
    )
    select row_number() over (order by d.ts desc, d.cid) as pos,
           d.cid as commit_id,
           cast(d.ts as bigint) as creation_ts
    from fpl join dag d on d.i = fpl.node
    """


def q_merge_base() -> str:
    from lakefs_spark.sources.dagspec import MB_PAIRS

    vals = ", ".join(f"({a}, {b})" for a, b in MB_PAIRS)
    # Best common ancestor = argmax over common ancestors of
    # (generation, then smallest id) — equivalent to the reference's
    # generation-ordered two-sided walk (merge_base_finder.go:23-76):
    # pops are in non-increasing generation order, so flags fully
    # propagate before any candidate pops.  Generation = longest path
    # from the root (graveler.go:3194-3198).
    return _dag_prefix() + f"""
    lp(node, depth) as (
      select 0, 1
      union
      select e.child, lp.depth + 1 from lp join edges e on e.parent = lp.node
    ),
    gen as (select node, max(depth) as gen from lp group by node),
    pairs(a, b) as (values {vals}),
    starts(s) as (select a from pairs union select b from pairs),
    anc(start, node) as (
      select s, s from starts
      union
      select anc.start, e.parent from anc join edges e on e.child = anc.node
    ),
    common as (
      select p.a, p.b, xa.node
      from pairs p
      join anc xa on xa.start = p.a
      join anc xb on xb.start = p.b and xb.node = xa.node
    ),
    ranked as (
      select c.a, c.b, c.node,
             row_number() over (partition by c.a, c.b
                                order by g.gen desc, c.node asc) as rn
      from common c join gen g on g.node = c.node
    )
    select printf('c%04d', a) as a, printf('c%04d', b) as b,
           printf('c%04d', node) as base_id
    from ranked where rn = 1
    """


def _ref_expr_sql(expr: str) -> str:
    """Compile one ref expression to a scalar-subquery chain — an
    independent mini-restatement of the grammar (resolve_ref.go):
    ``~N`` = N first-parent steps (fp table), ``^1`` = first parent,
    ``^2`` = second parent, ``^0`` = self, ``@``/``$`` = branch-state
    selectors (commit unchanged)."""
    import re

    from lakefs_spark.sources import dagspec as DG

    m = re.match(r"^[A-Za-z0-9]+", expr)
    base = m.group(0)
    if base in DG.BRANCHES:
        cur = str(DG.BRANCHES[base])
    elif base in DG.TAGS:
        cur = str(DG.TAGS[base])
    else:
        cur = str(int(base[1:]))  # 'cNNNN'
    for op, arg in re.findall(r"([~^@$])(\d*)", expr[m.end():]):
        if op in "@$":
            continue
        n = int(arg) if arg else 1
        if op == "~":
            cur = f"(select node from fp where start = ({cur}) and k = {n})"
        elif n == 0:
            pass
        elif n == 1:
            cur = f"(select parent1 from dag where i = ({cur}))"
        else:
            cur = f"(select parent2 from dag where i = ({cur}))"
    return f"select '{expr}' as expr, printf('c%04d', ({cur})) as commit_id"


def q_ref_resolve() -> str:
    from lakefs_spark.sources.dagspec import REF_EXPRS

    body = "\n    union all ".join(_ref_expr_sql(e) for e in REF_EXPRS)
    return _dag_prefix() + f"""
    fp(start, k, node) as (
      select i, 0, i from dag
      union
      select fp.start, fp.k + 1, d.parent1
      from fp join dag d on d.i = fp.node
      where d.parent1 is not null
    )
    {body}
    """


def q_gc_summary() -> str:
    return f"select count(*) as num_deleted_objects from ({q_gc_mark()}) t"


# -- end-to-end storage engine ---------------------------------------------
#
# The Spark side drives a real Repository (import -> commit ->
# revert / cherry-pick); the oracles restate the expected *final
# snapshots* relationally: c2 = staged_active overlaid on entries
# (tombstones dropped), c1 = entries unchanged.

def q_active_commits() -> str:
    # recursive walk per head with its cutoff: expand a node's parents
    # only while the node itself is at-or-after the cutoff, so the
    # first commit beyond the cutoff lands in the set unexpanded
    from lakefs_spark.sources.dagspec import BRANCHES, GC_CUTOFF_IDX, TAGS, date_of

    heads = ", ".join(
        f"({BRANCHES[b]}, {date_of(GC_CUTOFF_IDX[b])!r})" for b in sorted(BRANCHES)
    )
    tag_nodes = ", ".join(f"({i})" for i in sorted(TAGS.values()))
    return _dag_prefix() + f"""
    heads(node, cutoff) as (values {heads}),
    walk(node, cutoff) as (
      select node, cutoff from heads
      union
      select e.parent, w.cutoff
      from walk w
      join dag d on d.i = w.node
      join edges e on e.child = w.node
      where d.ts >= w.cutoff
    ),
    act(node) as (
      -- union all + outer distinct: inside WITH RECURSIVE, DuckDB
      -- treats a bare UNION CTE as an iteration and skips the dedup
      select node from walk
      union all
      select node from (values {tag_nodes}) t(node)
    )
    select distinct d.cid as commit_id from act join dag d on d.i = act.node
    """


def q_walker_entries() -> str:
    # walker key/etag/identity derivation restated: anchored base strip
    # ('/data/x/' is 8 chars -> substr from 9), etag over 'path|size'
    # (null mtime dropped by concat_ws), typed identity framing
    # len:value per field (functions/ident.py)
    ct = "application/octet-stream"
    return f"""
    with w as (
      select 'file:///data/x/data/' || cast(doc_id as varchar) || '/part-'
               || cast(doc_id % 4 as varchar) as path,
             cast(n_chars as bigint) as size
      from documents where doc_id % 7 = 0
    ),
    d as (
      select path, size,
             md5(path || '|' || cast(size as varchar)) as etag,
             'imported/' || substr(regexp_replace(path, '^[a-zA-Z0-9]+:/+', '/'), 9) as key
      from w
    )
    select key,
           sha256(
             cast(length(cast(size as varchar)) as varchar) || ':' || cast(size as varchar)
             || cast(length(etag) as varchar) || ':' || etag
             || '{len(ct)}:{ct}'
           ) as identity,
           path as address, size, etag
    from d
    """


def q_s3_list_pages() -> str:
    # flat pages: lexicographic listing windowed into 4000-key pages,
    # IsTruncated iff rows remain past the page; delimiter page: one
    # fold into first-segment CommonPrefixes (plus direct leaves)
    return with_views("entries", "staged_active") + f"""
    , snap as ({_active_overlay()}),
    flat as (
      select key, row_number() over (order by key) as rn,
             count(*) over () as total
      from snap where key like 'tables/%'
    ),
    delim as (
      select distinct 'tables/' || substring(sfx, 1, instr(sfx, '/')) as key,
             true as is_common_prefix
      from (select substring(key, 8, 1000000) as sfx from snap
            where key like 'tables/%') t
      where instr(sfx, '/') > 0
      union all
      select key, false from snap
      where key like 'tables/%'
        and instr(substring(key, 8, 1000000), '/') = 0
    )
    select 'flat' as mode,
           cast(floor((rn - 1) / 4000) as bigint) as page,
           key, false as is_common_prefix,
           ((cast(floor((rn - 1) / 4000) as bigint) + 1) * 4000 < total) as is_truncated
    from flat
    union all
    select 'delim', 0, key, is_common_prefix,
           (select count(*) from delim) > 1000
    from delim
    """


def _active_overlay(staged_filter: str = "true") -> str:
    return f"""
    select key, identity, size, etag from (
      select coalesce(s.key, e.key) as key,
             case when s.key is not null then s.identity else e.identity end as identity,
             case when s.key is not null then s.size else e.size end as size,
             case when s.key is not null then s.etag else e.etag end as etag,
             coalesce(s.is_tombstone, false) as tomb
      from entries e
      full outer join (select * from staged_active where {staged_filter}) s
        on e.key = s.key
    ) t where not tomb
    """


def q_repo_commit_snapshot() -> str:
    return with_views("entries", "staged_active") + _active_overlay()


def q_repo_revert_snapshot() -> str:
    return with_views("entries") + "select key, identity, size, etag from entries"


def q_repo_cherry_pick_snapshot() -> str:
    return with_views("entries", "staged_active") + _active_overlay()


def q_repo_merge_snapshot() -> str:
    return with_views("merge_base", "merge_source", "merge_dest") + merged_snapshot_sql(
        "merge_base", "merge_source", "merge_dest", "src"
    )


def q_repo_reset_prefix_snapshot() -> str:
    # ResetPrefix dropped the staged changes under LIST_PREFIX
    return with_views("entries", "staged_active") + _active_overlay(
        f"key not like '{LIST_PREFIX}%'"
    )


def q_repo_conditional_set_snapshot() -> str:
    # IfAbsent added one new key; identity-CAS replaced min(key)'s row;
    # the rejected writes (IfAbsent on existing, stale CAS) changed nothing
    return with_views("entries") + """
    select key, identity, size, etag from entries
    where key <> (select min(key) from entries)
    union all
    select (select min(key) from entries) as key,
           'cond-upd' as identity, cast(4242 as bigint) as size,
           'cond-upd-etag' as etag
    union all
    select 'tables/zz/cond-new' as key, 'cond-new' as identity,
           cast(1 as bigint) as size, 'cond-new-etag' as etag
    """


def q_repo_compact_snapshot() -> str:
    # compaction must not change the visible snapshot
    return with_views("entries", "staged_active") + _active_overlay()


def q_stream_ingest_snapshot() -> str:
    # event->entry mapping restated; the stream's commit-per-batch
    # mechanics (epoch skip, CAS pointer swap) produce exactly the union
    # of the batches = this projection
    return """
    with tagged as (
      select *,
             length(coalesce(cast(event_id as varchar), chr(0) || 'null')) || ':'
               || coalesce(cast(event_id as varchar), chr(0) || 'null') as t_id,
             length(coalesce(event_type, chr(0) || 'null')) || ':'
               || coalesce(event_type, chr(0) || 'null') as t_type,
             length(coalesce(cast(cast(value as decimal(30,6)) as varchar), chr(0) || 'null')) || ':'
               || coalesce(cast(cast(value as decimal(30,6)) as varchar), chr(0) || 'null') as t_val,
             length(coalesce(props, chr(0) || 'null')) || ':'
               || coalesce(props, chr(0) || 'null') as t_props
      from events where event_id % 10 = 0
    )
    select 'events/date=' || strftime(ts, '%Y-%m-%d') || '/'
             || lpad(cast(event_id as varchar), 12, '0') as key,
           md5(t_id || t_type || t_val) as identity,
           cast(octet_length(encode(coalesce(props, ''))) as bigint) as size,
           md5(t_id || t_props) as etag
    from tagged
    """


def q_repo_uncommitted_compacted() -> str:
    # combined diff == the staged_active changes vs the c1 snapshot:
    # 2-way diff semantics (equal identities and tombstones of absent
    # keys vanish); identity carries the new value for added/changed,
    # the old for removed
    return with_views("entries", "staged_active") + """
    select s.key,
           case when s.is_tombstone then 'removed'
                when c.identity is null then 'added'
                else 'changed' end as diff_type,
           case when s.is_tombstone then c.identity else s.identity end as identity
    from staged_active s
    left join entries c on s.key = c.key
    where not (s.is_tombstone and c.identity is null)
      and not (not s.is_tombstone and s.identity is not distinct from c.identity)
    """


def q_repo_copy_entry_snapshot() -> str:
    # c1 snapshot plus min(key)'s row re-keyed (same identity/etag/size)
    return with_views("entries") + """
    select key, identity, size, etag from entries
    union all
    select 'tables/zz/copied' as key, identity, size, etag
    from entries where key = (select min(key) from entries)
    """


def q_commit_ordered() -> str:
    return _dag_prefix() + """
    dummy(x) as (select 1)
    select row_number() over (order by d.cid) as pos, d.cid as commit_id
    from dag d
    """


def q_repo_restore_snapshot() -> str:
    # dump -> copy storage -> restore must reproduce the c2 snapshot
    return with_views("entries", "staged_active") + _active_overlay()


def q_repo_log_paths() -> str:
    # which commits changed each probe path: the upserted and deleted
    # probes see [c2, c1], the untouched probe sees only [c1]; the
    # probes themselves are derived from the fixtures, mirroring the
    # Spark side's choices
    upsert = """(select min(s.key) from staged_active s
                 where not s.is_tombstone and not exists (
                   select 1 from entries e
                   where e.key = s.key and e.identity = s.identity))"""
    untouched = """(select min(e.key) from entries e
                    where not exists (select 1 from staged_active s
                                      where s.key = e.key))"""
    deleted = """(select min(s.key) from staged_active s
                  where s.is_tombstone and exists (
                    select 1 from entries e where e.key = s.key))"""
    return with_views("entries", "staged_active") + f"""
    select {upsert} as path, cast(1 as bigint) as pos, 'apply staged_active' as message
    union all select {upsert}, cast(2 as bigint), 'base import'
    union all select {untouched}, cast(1 as bigint), 'base import'
    union all select {deleted}, cast(1 as bigint), 'apply staged_active'
    union all select {deleted}, cast(2 as bigint), 'base import'
    """


def q_repo_annotate() -> str:
    # blame over the 2-commit e2e history: the visible snapshot is the
    # COW overlay; a key attributes to c2 iff staged_active upserted it
    # with a different identity (diff semantics), else to the import
    return with_views("entries", "staged_active") + """
    , upserts as (select key, identity from staged_active where not is_tombstone),
    visible as (
      select key, identity from upserts
      union all
      select e.key, e.identity from entries e
      where not exists (select 1 from staged_active s where s.key = e.key)
    ),
    changed as (
      select u.key from upserts u
      where not exists (select 1 from entries e
                        where e.key = u.key and e.identity = u.identity)
    )
    select v.key,
           case when exists (select 1 from changed c where c.key = v.key)
                then 'apply staged_active' else 'base import' end as message
    from visible v
    """


def q_pull_requests() -> str:
    # pr1 merged (diff collapses: source head becomes the merge base);
    # pr2 open: dev changed every entries row under b5/ plus one added
    # key; pr3 closed over an unchanged branch
    return with_views("entries") + """
    select cast(1 as bigint) as pos, 'MERGED' as status, 'feature' as source,
           'main' as destination, cast(0 as bigint) as n_diff
    union all
    select 2, 'OPEN', 'dev', 'main',
           (select count(*) + 1 from entries where key like 'tables/orders/b5/%')
    union all
    select 3, 'CLOSED', 'wip', 'main', 0
    """


def q_branch_listing() -> str:
    # feature/main changed identities only (same key count); dev added
    # one key; the tag pins the pre-merge snapshot; tmp was deleted
    return with_views("entries") + """
    , n as (select cast(count(*) as bigint) as c from entries)
    select 'dev' as name, 'branch' as kind, c + 1 as n_entries, false as is_protected from n
    union all select 'feature', 'branch', c, false from n
    union all select 'main', 'branch', c, true from n
    union all select 'stg', 'branch', c, false from n  -- +1 staged, -1 tombstoned
    union all select 'wip', 'branch', c, false from n
    union all select 'v1', 'tag', c, false from n
    """


def q_point_lookup_branch() -> str:
    # overlay point-lookup fixtures staged on 'wip' by the governance
    # script: staged-only hit, tombstone hiding the min key, committed
    # fallthrough on the next key, and `@` pinning the committed head
    return with_views("entries") + """
    , k1 as (select min(key) as k from entries),
      k2 as (select min(key) as k from entries where key > (select k from k1))
    select cast(1 as bigint) as pos, 'staged_only' as kind,
           'tables/zz/staged-only' as key, 'st-1' as identity, cast(9 as bigint) as size
    union all
    select 2, 'tombstoned', (select k from k1), null, null
    union all
    select 3, 'fallthrough', (select k from k2),
           (select identity from entries where key = (select k from k2)),
           (select size from entries where key = (select k from k2))
    union all
    select 4, 'committed_at', (select k from k1),
           (select identity from entries where key = (select k from k1)),
           (select size from entries where key = (select k from k1))
    """


def q_list_page_probe() -> str:
    return with_views("entries") + f"""
    select key,
           cast((row_number() over (order by key) - 1) // 997 as bigint) as page
    from entries
    where key >= '{LIST_PREFIX}' and key < '{LIST_PREFIX_UPPER}'
    """


def q_hook_runs() -> str:
    # the scripted governance flow's run log, newest first (see
    # __spark_entry__._gov_repo): feature commit pair, dev commit pair,
    # the aborted pre-commit, then the branch delete
    return """
    select cast(1 as bigint) as pos, 'post-delete-branch' as event,
           cast(0 as bigint) as hook_index, 'completed' as status, false as has_error
    union all select 2, 'pre-commit', 0, 'aborted', true
    union all select 3, 'post-commit', 0, 'completed', false
    union all select 4, 'pre-commit', 0, 'completed', false
    union all select 5, 'post-commit', 0, 'completed', false
    union all select 6, 'pre-commit', 0, 'completed', false
    """


def q_expectation_gate() -> str:
    # audit trail of the expectation hook's two evaluations: the clean
    # subset (all pass, observed = fixture aggregates) and the poisoned
    # snapshot (negative min size fails; counts gain the staged row)
    return with_views("entries") + f"""
    , sub as (select * from entries
              where key >= '{LIST_PREFIX}' and key < '{LIST_PREFIX_UPPER}')
    select cast(1 as bigint) as pos, 'pre-commit' as event, 'no_negative_size' as rule,
           (select cast(min(size) as bigint) from sub) as observed,
           (select min(size) >= 0 from sub) as passed
    union all
    select 2, 'pre-commit', 'no_duplicate_keys', 0, true
    union all
    select 3, 'pre-commit', 'bounded_object_count',
           (select count(*) from sub), true
    union all
    select 4, 'pre-commit', 'no_negative_size', -1, false
    union all
    select 5, 'pre-commit', 'no_duplicate_keys', 0, true
    union all
    select 6, 'pre-commit', 'bounded_object_count',
           (select count(*) + 1 from sub), true
    """


def q_run_ttl_expiry() -> str:
    # 4 hook runs (pre+post per commit, 2 commits); the cutoff between
    # the two 50ms-separated groups drops exactly the first pair
    return """
    select cast(4 as bigint) as n_before, cast(2 as bigint) as n_dropped,
           cast(2 as bigint) as n_after, true as newest_group_kept
    """


def q_webhook_deliveries() -> str:
    # the scripted webhook flow's delivery log (__spark_entry__.
    # q_webhook_deliveries): first commit passes the 200 gate; the
    # second attempt POSTs to both hooks and the 500 vetoes it
    return """
    select cast(1 as bigint) as pos, '/ok' as path, 'pre-commit' as event,
           'main' as branch, cast(200 as bigint) as http_status
    union all select 2, '/ok', 'pre-commit', 'main', 200
    union all select 3, '/deny', 'pre-commit', 'main', 500
    """


def q_action_task_results() -> str:
    # the declarative-actions scenario's task log, oldest first
    # (__spark_entry__.q_action_task_results): the main commit runs
    # "size gate" (script + airflow + skipped failure()-cleanup) then
    # the post-commit "audit" fails without aborting; the feature-x
    # commit is vetoed by "feature guard"
    return """
    select cast(1 as bigint) as pos, 'size gate' as action, 'check_size' as hook_id,
           'script' as hook_type, 'pre-commit' as event, 'completed' as status
    union all select 2, 'size gate', 'notify', 'airflow', 'pre-commit', 'completed'
    union all select 3, 'size gate', 'cleanup', 'script', 'pre-commit', 'skipped'
    union all select 4, 'audit', 'boom', 'script', 'post-commit', 'failed'
    union all select 5, 'feature guard', 'deny', 'script', 'pre-commit', 'failed'
    """


def q_lua_hook_runs() -> str:
    # the embedded-Lua scenario's task log + first output line
    # (__spark_entry__.q_lua_hook_runs): commit 1 passes the lua
    # metadata gate (pairs/patterns/format all computed in the
    # interpreter) and the post-commit io-requiring script records the
    # explicit unsupported row; commit 2's bad metadata is vetoed
    return """
    select cast(1 as bigint) as pos, 'lua meta gate' as action,
           'lua_gate' as hook_id, 'lua' as hook_type,
           'pre-commit' as event, 'completed' as status,
           'main|checked=2|msg=INGEST' as output
    union all select 2, 'lua legacy audit', 'lua_io', 'lua',
           'post-commit', 'unsupported', null
    union all select 3, 'lua meta gate', 'lua_gate', 'lua',
           'pre-commit', 'failed', null
    """


def q_lua_diff_delimiter() -> str:
    # mirror of __spark_entry__.q_lua_diff_delimiter: the grouped diff
    # over added keys a/1 a/2 b/1 c ca with delimiter '/' — groups a/
    # and b/ fold to one prefix_changed common_prefix row each, c and
    # ca pass through as added objects; the amount=1 cursor walk then
    # reproduces the reference's UpperBoundForPrefix seek, which skips
    # leaf 'ca' after the page ending at leaf 'c' (catalog.go
    # GetStartPos:1983-1991 — reference semantics, not a bug fix)
    return """
    select cast(1 as bigint) as pos, 'all' as mode, 'a/' as path,
           'common_prefix' as path_type, 'prefix_changed' as dtype
    union all select 2, 'all', 'b/', 'common_prefix', 'prefix_changed'
    union all select 3, 'all', 'c', 'object', 'added'
    union all select 4, 'all', 'ca', 'object', 'added'
    union all select 5, 'walk', 'a/', 'common_prefix', 'prefix_changed'
    union all select 6, 'walk', 'b/', 'common_prefix', 'prefix_changed'
    union all select 7, 'walk', 'c', 'object', 'added'
    """


def q_lua_exporters() -> str:
    # mirror of __spark_entry__.q_lua_exporters: the stock delta / glue /
    # unity catalogexport chains running as real type:lua, normalized to
    # constants (commit sha → '<sha>'); the hostmods row is the exact
    # hmac-sha256/md5/Go-layout-time/z85 values those modules must
    # compute (independently derivable: hmac('spark','lakefs'),
    # md5('lakefs'), 2024-03-05 12:30:45 +0200 → UTC ISO, the Z85 spec
    # vector 'HelloWorld' twice → 8-byte block repeated)
    return """
    select cast(1 as bigint) as pos, 'delta' as component,
           'famous/_delta_log/00000000000000000000.json' as item,
           'add:s3://phys-bucket/data/part-0.parquet|metaData|protocol' as value
    union all select 2, 'delta', 'famous/_delta_log/00000000000000000001.json',
           'add:s3://phys-bucket/data/part-1.parquet|remove:part-gone.parquet'
    union all select 3, 'glue', 'create_database', 'my-db'
    union all select 4, 'glue', 'create_table',
           'animals_grepo_main_<sha>|EXTERNAL_TABLE|cols=weight:int,name:string|parts=type:string|s3://ext-bucket/ns/_lakefs/exported/main/<sha>/animals|org.apache.hadoop.hive.ql.io.SymlinkTextInputFormat|csv'
    union all select 5, 'unity', 'register_external_table',
           'CREATE EXTERNAL TABLE famous LOCATION ''s3://ext-bucket/ns/_lakefs/exported/main/<sha>/famous'' COMMENT ''famous animals'''
    union all select 6, 'unity', 'create_schema', 'main-cat.main'
    union all select 7, 'hostmods', 'crypto_time_z85',
           '84fbc965f426334fd1e7ed6cb63bef66eeea285a28d659e2c788543ee2a5529b|866648163d1bdbd266d02d5888e3ffe4|2024-03-05T10:30:45+00:00|864fd26f-b559-f75b-864f-d26fb559f75b'
    """


def q_sstable_import() -> str:
    # mirror of __spark_entry__.q_sstable_import: the lakeFS-written
    # golden SSTables (tests/data/sstable, vendored from the reference's
    # own Spark-client test resources) decoded to entry rows. 'migrated'
    # rows go through migrate_from_lakefs (metarange -> range -> commit
    # -> snapshot listing); 'ok1' rows through the distributed
    # binaryFile+mapInPandas parse. The expected values are the bytes
    # the reference's writer put in the fixtures.
    return """
    select cast(1 as bigint) as pos, 'migrated' as source, 'a/b/c/no' as key, '56fef3921aa6e7fd62bbe23b2f69db3f9049a54b6f2c7bd886b7eb1a6ca3ab3e' as identity, 'b0c968736d8f42a2b1c6284835f08226' as address, 'RELATIVE' as address_type, cast(11 as bigint) as size, '664c688b4ea9c56730daacfc3d70aeed' as etag, cast(1628163584 as bigint) as last_modified_s
    union all select cast(2 as bigint), 'migrated', 'a/b/c/yes', '6039b184d29379328b5364bb041b9926b4b388dbc326b7dd57f70cefd77b961e', 'fdf87fcf9ec849f98514ddb7e041ad56', 'RELATIVE', cast(4 as bigint), 'eb4585ad9fe0426781ed7c49252f8225', cast(1628163573 as bigint)
    union all select cast(3 as bigint), 'ok1', 'first', '9e80e89fc092c87e070a93980e41cb363962f32531e78d5759aec55c52ad3774', '4e068d1a46734113abd2218e87aace4c', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868766 as bigint)
    union all select cast(4 as bigint), 'ok1', 'run1/a', '91a5bb336a046bf36210cdece5afc34a35a4bc24a83839b03a4672f43a6fc0c2', '0707eb0e2c6d4eab8ff6fab5a6a4b517', 'BY_PREFIX_DEPRECATED', cast(3 as bigint), 'b68495714b0e1cad8ebaa1599766a942', cast(1610912063 as bigint)
    union all select cast(5 as bigint), 'ok1', 'run2/a', '6679f67dffc1dd3add31bfe2871bb0c01674a12b56fc36a3294fb8b13ed24dfc', '35fdf27b2203406286ab93a8963f0172', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610867985 as bigint)
    union all select cast(6 as bigint), 'ok1', 'run2/create.sh', 'b2acefb7242f52ffc94be8b0ae2bc56ee62689998af7d6244ac24815e3cdf446', '312bde87c44547d489b0f88eadb41154', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868771 as bigint)
    union all select cast(7 as bigint), 'ok1', 'run2/file_1', 'bd7abe405420d31851df947d61f5dfa6fc872e87d351e550c7e26a8643d4b81d', 'de1540bf14fb4a84bbb407edcde3ad9c', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868772 as bigint)
    union all select cast(8 as bigint), 'ok1', 'run2/file_10', '5b0eb9ea0ac72b2fc2260af8635479f57ac59bc3b9712d0eb2508e9061dc426c', '339d7360567b4878ad6c09d5a399473c', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868777 as bigint)
    union all select cast(9 as bigint), 'ok1', 'run2/file_100', 'f936ef802701553878cde76fd0ec0a2be7a25745513635b2fda81f2e73b5a587', 'f1bc0a367b7641a0b5e9c3c5aca62c8a', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868777 as bigint)
    union all select cast(10 as bigint), 'ok1', 'run2/file_11', 'ec0ab51e9e492a3e9a3c4853e4df620ac0fa507996ec54e2397cee3d7daa1fd5', 'd94b626e0b674df48dd7e8c185e1a55f', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868778 as bigint)
    union all select cast(11 as bigint), 'ok1', 'run2/file_12', 'ac0ca1880238a03432f489220c22acc36c46ef28580c86188573a9eeedd16d26', 'e5e3b3edd97d453c88686b08149352ff', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868783 as bigint)
    union all select cast(12 as bigint), 'ok1', 'run2/file_13', 'dfa15a8d687411fb7f9a799da62f0b33420a0dac17ad4d70ad2d72b575759d47', 'e56fc8d6206246e588275d85691d3eef', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868783 as bigint)
    union all select cast(13 as bigint), 'ok1', 'run2/file_14', '83298d14c5e080886e771734d1a1d9942bf5fd252178c65fd643ac73a3da43ec', '9ba79d06e05f4bbcb08078212cf5c884', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868783 as bigint)
    union all select cast(14 as bigint), 'ok1', 'run2/file_15', 'ee970853602feccdf832a6e911bb67523f6bcfa003e26b30cc1ce89cd701f726', '16e69121ebdd4f399bbd7f3e1b45ff3b', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868784 as bigint)
    union all select cast(15 as bigint), 'ok1', 'run2/file_16', '3ef62870e16683217aba56eda0ab7b3105c8407f50e1401f2f1c8ca462976744', 'd2080312432f4ed28c9bbad02ea2493e', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868784 as bigint)
    union all select cast(16 as bigint), 'ok1', 'run2/file_17', '3e5d6af71b6f92873b276695fd4737703ee367bd1cb929b4b6adcbbe3b4d685b', 'ca95fea04b3a4a0eb22334522362a5cb', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868784 as bigint)
    union all select cast(17 as bigint), 'ok1', 'run2/file_18', 'a350951766e8b1dcbf6792f18a5ba705faa12127c6d624583198962812863d58', '2cefebdc9c144facb09f150a6865f8ef', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868785 as bigint)
    union all select cast(18 as bigint), 'ok1', 'run2/file_19', 'fafab135d23bb48f8360ce436a2db46a751e8d40e552e689e627ef39801f39cf', '2a73f26207114b82935adb99b27f3d46', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868785 as bigint)
    union all select cast(19 as bigint), 'ok1', 'run2/file_2', '61e36ec0e343c56f6efcf0e9defc8c9648237308c774532e930bbbe48e15f0a0', '85aeb18d55784a799c5a32194088ca81', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868785 as bigint)
    union all select cast(20 as bigint), 'ok1', 'run2/file_20', 'eb436816510a1853566a59c300615e2f49537ef0d5f112569b828a21106afaa0', 'c30a77a3ebf94d6e8f0da7ea314d9d64', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868786 as bigint)
    union all select cast(21 as bigint), 'ok1', 'run2/file_21', '6f244114fa7b269675d3b8eea0ad90ecbd9838271695fb4a69830c71f13f8bb5', '992e7857f2334b8e90570ef0bc86f7c5', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868791 as bigint)
    union all select cast(22 as bigint), 'ok1', 'run2/file_22', '8e38c4de54262f7f7a2e03e65bd32df74857babb71c7c0e6a16c9364ad9cdefe', 'b35fe69a69144895aa02baadc50c0d63', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868791 as bigint)
    union all select cast(23 as bigint), 'ok1', 'run2/file_23', 'ebdcafccba6ee361e8c1b878336f49925e6df9a05ae34ee6896138aec6de14f7', 'f6db45caae5c4a87817aff46e6afe465', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868791 as bigint)
    union all select cast(24 as bigint), 'ok1', 'run2/file_24', 'f84b222d3942b1ba05b37dfed8f793b1a6943c496c7e54072bcd76070ef17236', 'efdc309443934d4c987e91dbd4875834', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868792 as bigint)
    union all select cast(25 as bigint), 'ok1', 'run2/file_25', '0650f2edd6f560f2ef0280ad0339ad0b460c4404db2d21495fe5ddb57c42f8cc', 'ca30c54de52a47b5b5ce8be6df18828b', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868792 as bigint)
    union all select cast(26 as bigint), 'ok1', 'run2/file_26', '0fe38e2e0a615a573918cab791c3d54dd2f8fb6f6620da629a15be8c5f9ac311', '5b6d9f555d8d4ca891bbbdb8e11ae8d0', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868792 as bigint)
    union all select cast(27 as bigint), 'ok1', 'run2/file_27', '650c383b2062db2a9b6fc60d2608a22355c7504b10e817665d82cb49dcc603f6', 'ebaf1e9e3d2745a2af7e1456e1348ffd', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868793 as bigint)
    union all select cast(28 as bigint), 'ok1', 'run2/file_28', 'c18845f332ce0008d9b49dec371b801757399eb5fe316f558f7670a78aabb5dd', '553ef83b69b34f02a49b1d85a1d616ae', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868793 as bigint)
    union all select cast(29 as bigint), 'ok1', 'run2/file_29', '6f5ba9d7352019aa5c4706252a4caa6052b8f70cb8d23da79af272e1486013c0', 'c4c4794585db4226b77d97e1419d5d1a', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868793 as bigint)
    union all select cast(30 as bigint), 'ok1', 'run2/file_3', 'c29a8120e83d12f525fb8864dd98489dd903ddb35a7ca12607aa7b216d77b6cf', 'bad291fed62e4e0ea7b319702ece7b3d', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868793 as bigint)
    union all select cast(31 as bigint), 'ok1', 'run2/file_30', 'ad2fdf8bc7c6f961ebdb7e5c760a0ab4dcf0619820cee0af41e15e7b760961bd', '3b656beb8c0f4420ad72f039d8430dc6', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868794 as bigint)
    union all select cast(32 as bigint), 'ok1', 'run2/file_31', '7533449c1c692a50e6817f4d3a79a50014f9e54417c4ff28bcbd07b483cbf6bb', '52ee97c5765545b8bfd1bbc4461c8387', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868794 as bigint)
    union all select cast(33 as bigint), 'ok1', 'run2/file_32', '973a2638d91d65af4187307bafe5ab27be9983794222cb7d4d144f497b69111b', 'c62270c604e14269927cc190f2cae173', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868794 as bigint)
    union all select cast(34 as bigint), 'ok1', 'run2/file_33', '150a77dfe38d1782b6965462eb2674a08a50f892b035ffb174529c4ac7d5bd49', '15ec9845f0fc47bbaaee38ae72fc13fa', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868795 as bigint)
    union all select cast(35 as bigint), 'ok1', 'run2/file_34', '9652d21c5630598a55eddfddfc6134092080acccd48b8ec760d9fa6b84dcdfd4', '860ad3216bff43cfba851487cc29c8b4', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868795 as bigint)
    union all select cast(36 as bigint), 'ok1', 'run2/file_35', '2fecba550f4627555840ceb37f250966cb4382c5258c4e03690d2171b93aa3f9', '06ca58e2e6214c38bb3d95a414a2b0d6', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868795 as bigint)
    union all select cast(37 as bigint), 'ok1', 'run2/file_36', '6e2614da603fde42c97aee598738c2cd19d5b632acbdc24b39a5f0b5387a607d', '509111c256fc415cbc3341a441e56b56', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868796 as bigint)
    union all select cast(38 as bigint), 'ok1', 'run2/file_37', '36ee57b6033fff2813a4bce0638084be2f102de7cdfbfa9c45b6c160d6189d96', '7b8c2c237cfb4baebc952794faa69d11', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868796 as bigint)
    union all select cast(39 as bigint), 'ok1', 'run2/file_38', '867d61824702ece23698ed174383c78ce45f44af544f8e4d228dce4c9532fca0', 'd68d4a613bb4470b956ca5166aacb69f', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868796 as bigint)
    union all select cast(40 as bigint), 'ok1', 'run2/file_39', '2fb1ef67f9d8b61fc5d8159e8fb35a5d4c69a93b1cf22e1d9dc153ea2cd1dd38', '034beeda778148a194f0bc6ca71634bd', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868796 as bigint)
    union all select cast(41 as bigint), 'ok1', 'run2/file_4', '0d9513632637acbc325b4e54422fdfd3f7f63fefee3e96877847c14e37fac202', 'bc5ee061efcb4a2595a6e9c17e0ad901', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868797 as bigint)
    union all select cast(42 as bigint), 'ok1', 'run2/file_40', 'ea86b158854261e2e59711d487748fdabcbca60d48dd465415daca6c8a6be560', 'db412ddaf691483fb12139ccb4bdf764', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868797 as bigint)
    union all select cast(43 as bigint), 'ok1', 'run2/file_41', '1d5b7bef4a5efde4e2b26a06961fe1334bda096824135f6b6c12ecaca19b6e50', 'ff674398fbd24e50a8bbada74fd1cf08', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868797 as bigint)
    union all select cast(44 as bigint), 'ok1', 'run2/file_42', '684a8f701b9e73320e93c6a184265eebe69d77222a177cd3c15966d5c6a8775b', 'c9b84b04f811497680b30c51652b79e9', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868798 as bigint)
    union all select cast(45 as bigint), 'ok1', 'run2/file_43', '211767615f332e0d4c170139dbcc9e5f6791dfbb9e4afd8749ac34947e9c2d8a', 'e4bd38fa7c3e454ab379a1112c5a3330', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868798 as bigint)
    union all select cast(46 as bigint), 'ok1', 'run2/file_44', '99df70300db7b88984acce026a104c3eb2f8683b5a42b7b4f9de67058bc327b7', 'a42a92c148534ce281f74d2840ebba92', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868798 as bigint)
    union all select cast(47 as bigint), 'ok1', 'run2/file_45', 'c36d64ca1b9819aa7785ee9718c88b840c0183ef5ceae985adbcc5d62fef891c', '8424f922b09a447d9cee1e643031aba6', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868799 as bigint)
    union all select cast(48 as bigint), 'ok1', 'run2/file_46', 'ae529814b94683d937a79ef1877ac4184d282f0e8d1ffb7547c2db186ae1a710', '8329bf46ac944a679b8ac256cdf98893', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868804 as bigint)
    union all select cast(49 as bigint), 'ok1', 'run2/file_47', '9daff5d34b8c5bc0a84d7104c99459bd68082da495178ea9b759ca312da2d564', 'a8e263ddb9f146079871ace62dfb3661', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868804 as bigint)
    union all select cast(50 as bigint), 'ok1', 'run2/file_48', '9435528111a91736a6659daa80200454582eb4518a7b24eaf3b8ed3a3790b7ac', 'dea11952b69045179995d2f59ce4ce70', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868804 as bigint)
    union all select cast(51 as bigint), 'ok1', 'run2/file_49', 'a115e4079bc53c0539903231df96ddd541c260f84668e0c32760ee28e50aa3c0', '53e9f2faa9e84abca043a957258aa043', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868805 as bigint)
    union all select cast(52 as bigint), 'ok1', 'run2/file_5', '85ecd60a47d0c328289141e55c8dad197ed215cf7941e66a26c25b3079c7ba85', '16a66b54a65243e2864255e291f7bca8', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868805 as bigint)
    union all select cast(53 as bigint), 'ok1', 'run2/file_50', 'e2599ba01bd451e8100c9a6b1bc3bb49f306007aee82ddf561cd283bc9bb74cd', 'd1acc77a0c054f1aa874d438590faca0', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868805 as bigint)
    union all select cast(54 as bigint), 'ok1', 'run2/file_51', 'b48b6e37d1b66e69bf3ab48eea88c602ec7d2241b030656154f6280de1359c6c', 'de73b8a1e9e34cfb854d10f4c1a5108a', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868811 as bigint)
    union all select cast(55 as bigint), 'ok1', 'run2/file_52', 'daa678f9b700447a3462aabd4d522c07dd736cbbab325034186376daefb524ba', '2f9cf5717eab4dce9a00c8efdadbfae4', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868816 as bigint)
    union all select cast(56 as bigint), 'ok1', 'run2/file_53', '844e22cdb4202e58a95180e31f233990eb26843d24221831d6911e5194ddddb5', '8f85076d786144138f1aadddd8cf39fe', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868816 as bigint)
    union all select cast(57 as bigint), 'ok1', 'run2/file_54', '6657ccfbcca7da6517cf9b01350635b4042dcdf7a626022a99c098f8b8dee77d', '1609486f0abd4b0b9a07b2972c39f97c', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868817 as bigint)
    union all select cast(58 as bigint), 'ok1', 'run2/file_55', 'bc1b6af57dc2ccd387c6bc94d12d2e993b1d3a6f363cf4759ec9d3fb1a0b3336', 'ac8f559d63d1498899b980216d5f6409', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868817 as bigint)
    union all select cast(59 as bigint), 'ok1', 'run2/file_56', 'd8bfdc87f2c12af57b3c670620c20f92e7d1965a0e214bcb6a4848bf604fcdcc', '94b30ce2187c4d69bd48524e5913732a', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868817 as bigint)
    union all select cast(60 as bigint), 'ok1', 'run2/file_57', '2b14a040bf23709f9452dd9b993bb48f83c9c7934e4957635bfc31fd994ab04e', '923421dfd38941efabdbc40b3a9c9c01', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868817 as bigint)
    union all select cast(61 as bigint), 'ok1', 'run2/file_58', 'ea39f005eca3391e7b732bf2b29828aa509a4ff35f489a1a3d5c3dcee1960bd4', 'eb8739c93e484f7d8373442324bc9cf4', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868818 as bigint)
    union all select cast(62 as bigint), 'ok1', 'run2/file_59', 'cacde9a6f3f31432a96b6f2938d740fe47e80c8e750b57bded346273583cfce6', 'ed2bdf0902c74cedbfe523dba096c4bc', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868818 as bigint)
    union all select cast(63 as bigint), 'ok1', 'run2/file_6', 'fef2d1e3ff3659ab076b1c4e2db89b9e2f488f9c957c9f76e016f8212b40b36c', 'dc72f03ffa9748cdb729eae884a024e2', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868818 as bigint)
    union all select cast(64 as bigint), 'ok1', 'run2/file_60', '745815865fdc677daa726fd2abd55bd9fb73e32f4bb43e50f19331059d04c216', '8288946d67774c63b03c6be6cf5bbf6e', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868819 as bigint)
    union all select cast(65 as bigint), 'ok1', 'run2/file_61', '799ec82c0cb5c5593d5f7acfd63da3a93ff82f0b19a532e28bcaf4cd1de7b7d8', '8167453922e34ef481b49a2b0545e08f', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868824 as bigint)
    union all select cast(66 as bigint), 'ok1', 'run2/file_62', 'da5c64a419aa4601f541e2b86fe8a78c6ad1728d11c0d52e5e72bc9ebdd97c02', 'eb8d480b32fb4d739c9fc203dcf4e530', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868824 as bigint)
    union all select cast(67 as bigint), 'ok1', 'run2/file_63', '52ad266cdba5df8426152d7730eacd62209c9c0e54144cb744f6333e6838c544', '9cb229f3302e46b1bc00810d9106169f', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868824 as bigint)
    union all select cast(68 as bigint), 'ok1', 'run2/file_64', '3875fe8139324bdc063a8fbbf55a7abfe6cb9d818e3973612cb1c4d9c7002d08', '80814dc5b55a49039b40d64533eb8f5f', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868825 as bigint)
    union all select cast(69 as bigint), 'ok1', 'run2/file_65', 'a2eb74ba51903b8784e0961a7a3f453a5b2b1204fe9769e722d08ce35010478b', 'c83a7a1b25e448a1b6f12fc962607fd9', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868825 as bigint)
    union all select cast(70 as bigint), 'ok1', 'run2/file_66', '21eab7e97db78044aae7a162e182ddc2d7484064ebe4f6388de8748e15ca4b2a', '9957952da2ff4e9dbc57ca12e8b18002', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868825 as bigint)
    union all select cast(71 as bigint), 'ok1', 'run2/file_67', 'a38f37e8b00f1e4d0c52244e7352da180b0d31cd4f0d1227664f522715b78713', '8b8de68f340743c28fce75c223bd72ec', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868826 as bigint)
    union all select cast(72 as bigint), 'ok1', 'run2/file_68', 'e73f12d09ae22bf3b11c1f454f43251f842066af7c85eda945a90d89cf6a6c70', 'fa315cc43eb14360968f9a40999ede5e', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868836 as bigint)
    union all select cast(73 as bigint), 'ok1', 'run2/file_69', 'b4ba383d72d67173291560b3a834d17440ae65b1d1425db84423630d66fba3b9', '694511abf293490b9213d55c27e2c6aa', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868836 as bigint)
    union all select cast(74 as bigint), 'ok1', 'run2/file_7', 'dbd7ec61586d14095e910df7e243cbdc6b7cf188542ba7115de7a5afa545b266', 'bc9696403f014f0db757c49713d3399e', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868836 as bigint)
    union all select cast(75 as bigint), 'ok1', 'run2/file_70', '485e4a8bc5796f7b0e542a7ecf154ca2b41736d58f1ac27390d4fd3262284c32', 'd305c650fe7e45f099c25b18dec45e94', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868837 as bigint)
    union all select cast(76 as bigint), 'ok1', 'run2/file_71', 'f055a6e3874cd7392984ecd53c9848e4a53b49d226a0a3bdf9829227f792894e', 'c343d9534ff0406d897c49e401b624b9', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868837 as bigint)
    union all select cast(77 as bigint), 'ok1', 'run2/file_72', '2021a15eba0bec10149cba04d60664662b2dda9285722095b95ab00d4a0d33e3', '79270108fab6414484923b95247245df', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868837 as bigint)
    union all select cast(78 as bigint), 'ok1', 'run2/file_73', '70edb07373519661ed1819be538b400f7f295740bf4f596d13dbe4fcaac4ce56', '71b0204db33a46b9a503608e5456e781', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868838 as bigint)
    union all select cast(79 as bigint), 'ok1', 'run2/file_74', '86f70dc6be9feb30cf86bf851136a68f6341f8cf24ef06c860499b247a1821c5', '422d40e4191a4e0cb3d22348cdd72b68', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868838 as bigint)
    union all select cast(80 as bigint), 'ok1', 'run2/file_75', 'a0b4c3a23aa00de6614fbaa2ee334b6bc1c8675e75428a46e714b3ac86f6983f', '8563de1b4015438e90877d7fb27b2a17', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868838 as bigint)
    union all select cast(81 as bigint), 'ok1', 'run2/file_76', 'f995ebc7e51d6fdd401bb83d85cc69dbaa7243f4251dad2ebe83f88f2b4b0ba1', 'aec29c42df694ad7b3243b3243d477a6', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868838 as bigint)
    union all select cast(82 as bigint), 'ok1', 'run2/file_77', '674569d575e39b66c193b06af56983c189e780aad21c80b4dbdd851cd45f46ef', '3d3ec76aef724e9fab78198e35fbdeff', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868839 as bigint)
    union all select cast(83 as bigint), 'ok1', 'run2/file_78', '584b355c17fecafb366638164a5553369dbd5bbcb668bd90450c2757214eca6f', '9f584f31ea5844baa73eb1fd548e0377', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868839 as bigint)
    union all select cast(84 as bigint), 'ok1', 'run2/file_79', '72a922036caefc5bdadaf3fddf2cc02aec78f1ead8ba760f8d12d736e2afb8dc', '848049febbcd4846881e43f5f76a08d1', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868839 as bigint)
    union all select cast(85 as bigint), 'ok1', 'run2/file_8', '0b04459e9e5b10571f8629b867daf2cf0dbff486a68f782c763ee3a6395bee3e', 'f4dccfa844324f26a762bf3ad3e42197', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868840 as bigint)
    union all select cast(86 as bigint), 'ok1', 'run2/file_80', 'f4cfe2eefef44804a714ea48cf8da9bdad89c04664972848225b39c63558b081', '36e358b7b86e49e0ba6ee548c8a5b4c5', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868845 as bigint)
    union all select cast(87 as bigint), 'ok1', 'run2/file_81', 'd886a9977513a02ed0ec34b004ee3ce033dadcaf4eebaed7b2e65e477567915a', '5e736880d30d42729c0a6e077e103550', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868845 as bigint)
    union all select cast(88 as bigint), 'ok1', 'run2/file_82', 'ae8a646331dba58e92972ed1e7c23dde2785563c151625979bf758a63ace71f5', '034f245021654132986dcfbad16ea9d4', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868845 as bigint)
    union all select cast(89 as bigint), 'ok1', 'run2/file_83', '38f78441d697c01db58ef6a3df6ebe0f15680b4606b489a58018b4e6f5a8620e', '532775c7d8c046afb1378d933ea95609', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868846 as bigint)
    union all select cast(90 as bigint), 'ok1', 'run2/file_84', '1dca1a9f0ec1c078fd5f379660c2f18099874ff38431cd41fa501cb59abb4050', 'e097303aac684c0193d93701e880b861', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868846 as bigint)
    union all select cast(91 as bigint), 'ok1', 'run2/file_85', 'c6bd73e20c2e4b4cfde5cde1165f35cdbbb259b78d2920d6afe6f0d136533386', '0dfd50b47e4649218b0ccd8d942c9974', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868846 as bigint)
    union all select cast(92 as bigint), 'ok1', 'run2/file_86', 'e9366c06a6d8ed5bd9dcea118cfeee56b0943b57cf979ae24c162f733947d762', '3ac4d81363554efcbb2a3bfbc3e543e8', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868847 as bigint)
    union all select cast(93 as bigint), 'ok1', 'run2/file_87', '2231cca08d675d7e9301098de1d0eedec0bb9b81e078a869e6afa46794e6478e', '245dd0465c4847f1a28b8dad84b7433f', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868847 as bigint)
    union all select cast(94 as bigint), 'ok1', 'run2/file_88', '856e8205efa2ee51c3a14caa35c44313629a5c9a6f5fa2a763c459bbe0c47cc8', '31d29ad149bb4c72b7ce074919c3511b', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868847 as bigint)
    union all select cast(95 as bigint), 'ok1', 'run2/file_89', 'a8e669da0194ba04ec0921f13c2de5916c81c572d85ac318cd53b251d6300b44', '0204a057ccce48159b269dcfefd07406', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868847 as bigint)
    union all select cast(96 as bigint), 'ok1', 'run2/file_9', 'b4a9b12643f96de48e087ce3ef50104e2e51b8f21fc6aa3fd2d0ad63f903e192', 'f761cace9896437998582062548448bb', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868848 as bigint)
    union all select cast(97 as bigint), 'ok1', 'run2/file_90', 'ee21127a12530a66b2ea9003dc043d20ad1f402bba19ef5f7a398a3f3b0c46ac', '797f3ccd88f34dd4b6be540621313291', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868848 as bigint)
    union all select cast(98 as bigint), 'ok1', 'run2/file_91', '0a02e7666a79c5c2fa358dd3dcbed5b6e42bf206b8fa91de687045ad7625aeb7', '80363a6eac4f4c4281adb2c5816f0601', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868848 as bigint)
    union all select cast(99 as bigint), 'ok1', 'run2/file_92', 'ac1edcd0d8ad7f6ef255dc18f550aa8bd389b9eb07c0b5bece799bcbd7489d58', '09feff9f067548dda14ac98f5654cd1f', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868848 as bigint)
    union all select cast(100 as bigint), 'ok1', 'run2/file_93', 'bedaadbd264ac5ab2fbc49221b8f8d0572af43bdede99e0daccf0a06f7b9ab85', 'f3b65f7966044454aa30f6839a98d59f', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868849 as bigint)
    union all select cast(101 as bigint), 'ok1', 'run2/file_94', '5510b20d749609a855e3d4c43f87df88d4b1238f56a9a0b08dddef5daa01803c', 'c33bfa5e1891426d8a9ffb7e2e02ea3d', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868849 as bigint)
    union all select cast(102 as bigint), 'ok1', 'run2/file_95', '82ead7c9399d396487d7f7580cba3e7902013cb7a2a4768ab77657e0a3661796', 'ad30fa7f89804ec3a32a24a0923ca0fb', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868849 as bigint)
    union all select cast(103 as bigint), 'ok1', 'run2/file_96', '81ee8746a488bb1c68455c0e4a5f0ec33f8d4f845234ed6468c6c6937d3113d5', '56df8312a6b34f969519fbd191eb2528', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868850 as bigint)
    union all select cast(104 as bigint), 'ok1', 'run2/file_97', 'fba68a576079c834eedbd86a7975f6288b9944333c83c9edbf873c421f4702d6', '5edca37b9ca7454f90b5b55771f2353b', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868850 as bigint)
    union all select cast(105 as bigint), 'ok1', 'run2/file_98', 'ec59ae368801b75c3bb6bec2270dffe09bb50354e0ae4f5f26b9cdc6a8373e15', '03f22b5b28174ac2a5b3e60b77a584ea', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868850 as bigint)
    union all select cast(106 as bigint), 'ok1', 'run2/file_99', '152a06743df4fdde9196f216c3c15dffb9378d83163ff3042ba67bb24a8d127a', '83410ea191c04c98811d82fa88c1f2bf', 'BY_PREFIX_DEPRECATED', cast(2 as bigint), 'b026324c6904b2a9cb4b88d6d61c81d1', cast(1610868850 as bigint)
    union all select cast(107 as bigint), 'ok1', 'xyzzy', 'bcca4779251e62ba70c1fe8836884d77f668719c85ecfa888de7bd62df0522bb', '7c5dc4fac42d4846aa6cc35f7e9c91f7', 'BY_PREFIX_DEPRECATED', cast(4 as bigint), 'ed22fdfd3a1495bf6bcad854d6546790', cast(1610619018 as bigint)
    union all select cast(108 as bigint), 'export', 'range_id', 'd424c7e9402fb6c4b93720af81f563ecc8cd0dd5ebc284b96c46e238b6fb7e02', '', '', cast(5 as bigint), 'roundtrip_ok', cast(0 as bigint)
    union all select cast(109 as bigint), 'export', 'metarange_id', '70b7dcb6fad7f3e32edf9ca3b95c6cf00b544061971d97345b28cef399625fec', '', '', cast(1 as bigint), '', cast(0 as bigint)
    """


def q_lua_stock_validators() -> str:
    # mirror of __spark_entry__.q_lua_stock_validators: the vendored
    # examples/hooks validators dispatched as real type:lua gates —
    # each vetoes its bad case (marker seen in the abort error) and
    # passes its good case
    return """
    select cast(1 as bigint) as pos, 'format_validator' as validator,
           'pre-merge' as event, 'failed' as status, 'veto-marker-seen' as marker
    union all select 2, 'format_validator', 'pre-merge', 'completed', ''
    union all select 3, 'dataset_validator', 'pre-merge', 'failed', 'veto-marker-seen'
    union all select 4, 'dataset_validator', 'pre-merge', 'completed', ''
    union all select 5, 'commit_metadata_validator', 'pre-commit', 'failed', 'veto-marker-seen'
    union all select 6, 'commit_metadata_validator', 'pre-commit', 'completed', ''
    union all select 7, 'action_logger', 'post-commit', 'completed', 'action-json-roundtrips'
    union all select 8, 's3_branch_head_exporter', 'post-commit', 'completed', 'head-file-is-commit-id'
    union all select 9, 's3_hive_manifest_exporter', 'post-commit', 'completed', 'clean-mode-symlinks=2'
    union all select 10, 's3_hive_manifest_exporter', 'post-commit', 'completed', 'diff-mode-regenerates-dirty-only'
    union all select 11, 'delta_lake_S3_export', 'post-commit', 'completed', 'delta-log-exported'
    union all select 12, 'delta_lake_azure_export', 'post-commit', 'completed', 'delta-log-exported'
    union all select 13, 'unity_table_export', 'post-commit', 'completed', 'unity-registered'
    union all select 14, 'unity_table_export_azure', 'post-commit', 'completed', 'unity-registered'
    """


def q_text_normalize() -> str:
    # mirror of __spark_entry__.q_text_normalize: dirty each doc with a
    # DECOMPOSED accent (e + U+0301), a bell, a tab and space runs,
    # then NFC + control-strip + whitespace-collapse + trim
    return r"""
    with dirty as (
      select doc_id,
             'Ae' || chr(769) || ' ' || substr(text, 1, 40)
             || chr(7) || chr(9) || '  tail  ' as text
      from documents
    ), norm as (
      select doc_id, text,
             trim(regexp_replace(
               regexp_replace(nfc_normalize(text),
                 '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]', '', 'g'),
               '\s+', ' ', 'g')) as n
      from dirty
    )
    select doc_id, md5(n) as norm_md5,
           cast(length(n) as bigint) as norm_len,
           n <> text as changed
    from norm
    """


_URL_FIXTURE = r"""
    with urls as (
      select doc_id,
        case when doc_id % 2 = 0 then 'HTTP://' else 'HTTPS://' end
        || case when doc_id % 11 = 0 then 'User:Pw@' else '' end
        || case when doc_id % 2 = 0 then 'WWW.Example' else 'Example' end
        || cast(doc_id % 7 as varchar) || '.COM'
        || case when doc_id % 2 = 0 then ':80'
                when doc_id % 5 = 0 then ':8443' else ':443' end
        || '/p/' || cast(doc_id % 50 as varchar) || '/'
        || case when doc_id % 3 = 0 then '?b=2&a=1&c=3' else '' end
        || '#frag' as url
      from documents
    ), parts as (
      select doc_id,
        lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) as scheme,
        regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#]*)', 1) as hostport,
        regexp_replace(regexp_extract(url,
          '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1), '/+$', '') as path,
        regexp_extract(url, '\?([^#]*)', 1) as query
      from urls
    ), p2 as (
      select doc_id, scheme, path, query,
        lower(regexp_extract(hostport, '^([^:]*)', 1)) as host,
        regexp_extract(hostport, ':(\d+)$', 1) as port
      from parts
    ), canon as (
      select doc_id,
        scheme || '://' || host
        || case when port <> '' and not ((scheme = 'http' and port = '80')
                                      or (scheme = 'https' and port = '443'))
                then ':' || port else '' end
        || path
        || case when query <> ''
                then '?' || array_to_string(list_sort(string_split(query, '&')), '&')
                else '' end as canon_url,
        regexp_replace(host, '^www\.', '') as domain
      from p2
    )
"""


def q_url_canonical() -> str:
    # mirror of __spark_entry__.q_url_canonical
    return _URL_FIXTURE + "select doc_id, canon_url, domain from canon"


def q_domain_stats() -> str:
    # mirror of __spark_entry__.q_domain_stats (one hash aggregation)
    return _URL_FIXTURE + r"""
    select domain,
           count(*) as n_pages,
           count(distinct canon_url) as n_unique_urls,
           round(1.0 - count(distinct canon_url) / count(*), 6) as dup_ratio
    from canon
    group by domain
    order by domain
    """


def q_line_dedup() -> str:
    # mirror of __spark_entry__.q_line_dedup, via DuckDB list ops — a
    # different implementation family from the Spark explode+join+
    # reassemble, which is what makes the hash oracle meaningful
    return """
    with d as (
      select doc_id,
             'COOKIE BANNER' || chr(10) || substr(text, 1, 60)
             || chr(10) || chr(10)
             || case when doc_id % 4 = 0 then 'NAV FOOTER'
                     else 'tail-' || cast(doc_id as varchar) end as text
      from documents
    ), exploded as (
      select doc_id, unnest(string_split(text, chr(10))) as line from d
    ), banned as (
      select line from exploded where line <> ''
      group by line having count(distinct doc_id) >= 3
    ), barr as (
      select coalesce(list(line), []) as bl from banned
    ), kept as (
      select d.doc_id,
             string_split(d.text, chr(10)) as all_lines,
             list_filter(string_split(d.text, chr(10)),
                         x -> not list_contains(barr.bl, x)) as kl
      from d cross join barr
    )
    select doc_id,
           array_to_string(kl, chr(10)) as clean_text,
           cast(len(kl) as bigint) as n_kept,
           cast(len(all_lines) - len(kl) as bigint) as n_removed
    from kept
    """


def q_pii_counts() -> str:
    from lakefs_spark.operators.pipeline import EMAIL_RE, IPV4_RE, PHONE_RE

    probe = """
      select c_custkey as id,
             concat_ws(' ', c_name, c_mktsegment,
               case when c_custkey % 3 = 0
                    then concat(regexp_replace(lower(c_name), '[^a-z0-9]', '.', 'g'), '@example.com') end,
               case when c_custkey % 5 = 0
                    then concat_ws('-', cast(c_custkey % 90 + 10 as varchar),
                                        cast(c_custkey % 900 + 100 as varchar),
                                        cast((c_custkey * 7) % 900 + 100 as varchar),
                                        cast(c_custkey % 9000 + 1000 as varchar)) end,
               case when c_custkey % 7 = 0
                    then concat('10.20.', cast(c_custkey % 256 as varchar), '.', cast(c_custkey % 100 as varchar)) end
             ) as text
      from customer
    """
    e, i, p = EMAIL_RE, IPV4_RE, PHONE_RE
    return f"""
    with probe as ({probe})
    select id,
           cast(len(regexp_extract_all(text, '{e}')) as bigint) as n_email,
           cast(len(regexp_extract_all(text, '{i}')) as bigint) as n_ipv4,
           cast(len(regexp_extract_all(text, '{p}')) as bigint) as n_phone,
           (len(regexp_extract_all(text, '{e}'))
            + len(regexp_extract_all(text, '{i}'))
            + len(regexp_extract_all(text, '{p}'))) > 0 as has_pii,
           cast(length(regexp_replace(regexp_replace(regexp_replace(text,
                 '{e}', '<EMAIL>', 'g'), '{i}', '<IP>', 'g'), '{p}', '<PHONE>', 'g')) as bigint) as redacted_len
    from probe
    """


def _dsir_ctes(n_buckets: int = 4096) -> str:
    # independent restatement of the DSIR pipeline with DuckDB list
    # ops: unigram+bigram features, portable md5 bucket, add-one
    # smoothed log-ratio of target (source='src0') vs raw counts
    return f"""
    tokd as (
      select doc_id, source,
             list_filter(string_split(text, ' '), t -> t <> '') as toks
      from documents
    ),
    feats as (
      select doc_id, source, f from (
        select doc_id, source,
               unnest(list_concat(toks,
                 list_transform(range(1, greatest(len(toks), 1)),
                                i -> toks[i] || ' ' || toks[i + 1]))) as f
        from tokd)
    ),
    bucketed as (
      select doc_id, source,
             cast(concat('0x', substr(md5(f), 1, 15)) as bigint) % {n_buckets} as bucket
      from feats
    ),
    rc as (select bucket, count(*) as r_cnt from bucketed group by bucket),
    tc as (select bucket, count(*) as t_cnt from bucketed where source = 'src0' group by bucket),
    wtab as (
      select coalesce(rc.bucket, tc.bucket) as bucket,
             coalesce(t_cnt, 0) as t_cnt, coalesce(r_cnt, 0) as r_cnt
      from rc full outer join tc on rc.bucket = tc.bucket
    ),
    tot as (select sum(t_cnt) as t_total, sum(r_cnt) as r_total from wtab),
    w as (
      select bucket,
             ln((t_cnt + 1) / (t_total + {n_buckets}.0))
               - ln((r_cnt + 1) / (r_total + {n_buckets}.0)) as log_w
      from wtab cross join tot
    ),
    scored as (
      select b.doc_id, cast(count(*) as bigint) as n_feats,
             sum(w.log_w) as raw_w
      from bucketed b join w using (bucket) group by b.doc_id
    ),
    weights as (
      select d.doc_id,
             coalesce(s.n_feats, 0) as n_feats,
             round(coalesce(s.raw_w, 0.0), 6) as log_weight
      from (select doc_id from documents) d left join scored s using (doc_id)
    )"""


def q_dsir_weights() -> str:
    return f"""
    with {_dsir_ctes()}
    select doc_id, n_feats, log_weight from weights
    """


def q_dsir_top() -> str:
    return f"""
    with {_dsir_ctes()},
    ranked as (
      select cast(row_number() over (order by log_weight desc, doc_id) as bigint) as rank,
             doc_id, log_weight
      from weights
    )
    select rank, doc_id, log_weight from ranked where rank <= 50
    """


def q_sampling_weights() -> str:
    return """
    with c as (select lang, cast(count(*) as bigint) as n_docs from documents group by lang),
         t as (select sum(pow(n_docs, 0.7)) as z from c)
    select lang, n_docs,
           round(pow(n_docs, 0.7) / z, 6) as weight,
           cast(floor(pow(n_docs, 0.7) / z * 1000 + 0.5) as bigint) as budget_docs
    from c, t
    """


def q_sequence_packing() -> str:
    # replay of the greedy walk: recursion order == pandas loop order
    return """
    with recursive d as (
      select doc_id, doc_id % 8 as shard,
             cast(len(string_split(text, ' ')) as bigint) as n_tokens,
             row_number() over (partition by doc_id % 8 order by doc_id) as rn
      from documents
    ),
    acc as (
      select shard, rn, doc_id, n_tokens, n_tokens as seq_fill, cast(0 as bigint) as seq_id
      from d where rn = 1
      union all
      select d.shard, d.rn, d.doc_id, d.n_tokens,
             case when a.seq_fill + d.n_tokens > 512 then d.n_tokens
                  else a.seq_fill + d.n_tokens end,
             case when a.seq_fill + d.n_tokens > 512 then a.seq_id + 1 else a.seq_id end
      from acc a join d on d.shard = a.shard and d.rn = a.rn + 1
    )
    select doc_id, cast(shard as bigint) as shard, n_tokens, seq_id,
           cast(seq_fill as bigint) as seq_fill
    from acc
    """


_PASSAGES_SQL = """
    with t as (select doc_id, string_split(text, ' ') as toks from documents),
    passages as (
      select doc_id, i as win_idx,
             array_to_string(toks[(i*3+1):(i*3+3)], ' ') as passage
      from t, unnest(range(0, greatest(cast(ceil(len(toks)/3.0) as bigint), 1))) as u(i)
    )
"""


def q_passage_dedup() -> str:
    return f"""
    {_PASSAGES_SQL}
    select md5(passage) as passage_hash,
           cast(count(*) as bigint) as n_occurrences,
           cast(count(distinct doc_id) as bigint) as n_docs
    from passages
    group by 1
    having count(distinct doc_id) >= 2
    """


def q_boilerplate_strip() -> str:
    return f"""
    {_PASSAGES_SQL},
    p as (select doc_id, md5(passage) as passage_hash,
                 cast(len(string_split(passage, ' ')) as bigint) as p_toks
          from passages),
    boiler as (select passage_hash from p group by 1
               having count(distinct doc_id) >= 5),
    hits as (select doc_id, cast(count(*) as bigint) as n_boiler,
                    sum(p_toks) as boiler_toks
             from p semi join boiler using (passage_hash)
             group by doc_id),
    totals as (select doc_id, cast(count(*) as bigint) as n_windows,
                      sum(p_toks) as n_toks
               from p group by doc_id)
    select t.doc_id, t.n_windows,
           coalesce(h.n_boiler, 0) as n_boiler,
           cast(t.n_toks - coalesce(h.boiler_toks, 0) as bigint) as clean_tokens,
           round(1.0 - coalesce(h.n_boiler, 0) / cast(t.n_windows as double), 6) as clean_ratio
    from totals t left join hits h using (doc_id)
    """


def q_label_centroids() -> str:
    return """
    with e as (
      select label, cast(unnest(embedding) as double) as x,
             unnest(range(len(embedding))) as i
      from embeddings
    )
    select cast(label as bigint) as label, cast(i as bigint) as dim,
           round(avg(x), 6) as centroid,
           cast(count(*) as bigint) as n_vectors
    from e group by 1, 2
    """


def q_prototypicality() -> str:
    # centroids rounded to 6dp BEFORE the dot product (matches the
    # Spark side exactly); rank orders by the rounded score with a
    # vec_id tiebreak so ordering is engine-independent
    return """
    with e as (
      select vec_id, cast(label as bigint) as label,
             cast(unnest(embedding) as double) as x,
             unnest(range(len(embedding))) as i
      from embeddings
    ),
    cent as (
      select label, i, round(avg(x), 6) as c
      from e group by 1, 2
    ),
    agg as (
      select e.vec_id, e.label,
             sum(e.x * c.c) as dot,
             sum(e.x * e.x) as n1,
             sum(c.c * c.c) as n2
      from e join cent c on c.label = e.label and c.i = e.i
      group by 1, 2
    ),
    scored as (
      select cast(vec_id as bigint) as vec_id, label,
             round(dot / nullif(sqrt(n1) * sqrt(n2), 0), 6) as proto_cos
      from agg
    )
    select vec_id, label, proto_cos,
           cast(row_number() over (
             partition by label order by proto_cos desc, vec_id
           ) as bigint) as proto_rank
    from scored
    """


def q_stratified_sample() -> str:
    from lakefs_spark.functions.hashfam import X_MOD

    bucket = (
        f"cast(concat('0x', substr(md5(concat('sample|', cast(doc_id as varchar))), 1, 15)) "
        f"as bigint) % {X_MOD} % 1048576"
    )
    return f"""
    with c as (select lang, cast(count(*) as bigint) as n_docs from documents group by lang),
         t as (select sum(pow(n_docs, 0.7)) as z from c),
         r as (select lang,
                      cast(floor(pow(n_docs, 0.7) / z * 1000 + 0.5) as bigint)
                        / cast(n_docs as double) as rate
               from c, t)
    select d.doc_id, d.lang,
           ({bucket}) / 1048576.0 < r.rate as is_kept
    from documents d join r using (lang)
    """


def q_length_band_filter() -> str:
    return """
    with q as (select quantile_cont(n_chars, 0.05) as q_lo,
                      quantile_cont(n_chars, 0.95) as q_hi
               from documents)
    select doc_id, cast(n_chars as bigint) as value,
           round(q_lo, 6) as q_lo, round(q_hi, 6) as q_hi,
           n_chars >= round(q_lo, 6) and n_chars <= round(q_hi, 6) as in_band
    from documents, q
    """



def q_s3_list_v1_pages() -> str:
    # V1 marker paging: 3000-key lexicographic pages over the active
    # overlay; each row carries the marker its page resumed from (the
    # last key of the previous page) and the page's IsTruncated flag
    return with_views("entries", "staged_active") + f"""
    , snap as ({_active_overlay()}),
    flat as (
      select key, row_number() over (order by key) as rn,
             count(*) over () as total
      from snap where key like 'tables/%'
    )
    select 'v1' as mode,
           cast(floor((rn - 1) / 3000) as bigint) as page,
           key,
           coalesce((select max(f2.key) from flat f2
                     where f2.rn <= cast(floor((f1.rn - 1) / 3000) as bigint) * 3000), '') as marker,
           ((cast(floor((rn - 1) / 3000) as bigint) + 1) * 3000 < total) as is_truncated
    from flat f1
    """


def q_repo_squash_merge_snapshot() -> str:
    return with_views("merge_base", "merge_source", "merge_dest") + merged_snapshot_sql(
        "merge_base", "merge_source", "merge_dest", "src"
    )


def q_repo_revert_merge_snapshot() -> str:
    return with_views("merge_dest") + "select key, identity, size, etag from merge_dest"



def q_pq_codes() -> str:
    # PQ encode restated relationally: per (vector, subspace), code =
    # argmax_c dot(v_m, c_m) - ||c_m||^2/2 (== argmin L2), tie -> min
    # cid; codebook = the K=25 md5-ranked vectors' subvectors (deterministic)
    return """
    with cb as (
      select vec_id as cid,
             cast(floor((r.j - 1) / 16) as bigint) as m,
             r.j as j,
             cast(embedding[r.j] as double) as val
      from embeddings cross join range(1, 65) r(j)
      where vec_id in (select vec_id from embeddings
        order by md5(cast(vec_id as varchar)), vec_id limit 25)
    ),
    cnorm as (select m, cid, sum(val * val) / 2.0 as h from cb group by m, cid),
    scores as (
      select e.vec_id, cb.m, cb.cid,
             sum(cast(e.embedding[cb.j] as double) * cb.val) as dot
      from embeddings e join cb on true
      group by e.vec_id, cb.m, cb.cid
    ),
    best as (
      select vec_id, m, cid from (
        select s.vec_id, s.m, s.cid,
               row_number() over (partition by s.vec_id, s.m
                                  order by s.dot - n.h desc, s.cid) as rn
        from scores s join cnorm n on n.m = s.m and n.cid = s.cid
      ) t where rn = 1
    )
    select vec_id, m, cid as code from best
    """


def q_pq_topk() -> str:
    # ADC search: per-query (m, cid) distance tables, score = fixed
    # left-assoc sum of the 4 table lookups along each vector's codes
    return """
    with cb as (
      select vec_id as cid,
             cast(floor((r.j - 1) / 16) as bigint) as m,
             r.j as j,
             cast(embedding[r.j] as double) as val
      from embeddings cross join range(1, 65) r(j)
      where vec_id in (select vec_id from embeddings
        order by md5(cast(vec_id as varchar)), vec_id limit 25)
    ),
    cnorm as (select m, cid, sum(val * val) / 2.0 as h from cb group by m, cid),
    scores as (
      select e.vec_id, cb.m, cb.cid,
             sum(cast(e.embedding[cb.j] as double) * cb.val) as dot
      from embeddings e join cb on true
      group by e.vec_id, cb.m, cb.cid
    ),
    best as (
      select vec_id, m, cid from (
        select s.vec_id, s.m, s.cid,
               row_number() over (partition by s.vec_id, s.m
                                  order by s.dot - n.h desc, s.cid) as rn
        from scores s join cnorm n on n.m = s.m and n.cid = s.cid
      ) t where rn = 1
    ),
    c0 as (select vec_id, cid as code from best where m = 0),
    c1 as (select vec_id, cid as code from best where m = 1),
    c2 as (select vec_id, cid as code from best where m = 2),
    c3 as (select vec_id, cid as code from best where m = 3),
    qtab as (
      select q.vec_id as qa, cb.m, cb.cid,
             sum(cast(q.embedding[cb.j] as double) * cb.val) as dot
      from embeddings q join cb on true
      where q.vec_id < 8
      group by q.vec_id, cb.m, cb.cid
    ),
    qs as (
      select qa, m, cid, qtab.dot - n.h as s
      from qtab join cnorm n using (m, cid)
    ),
    adc as (
      select t0.qa, c0.vec_id as qb, t0.s + t1.s + t2.s + t3.s as score
      from c0
      join c1 on c1.vec_id = c0.vec_id
      join c2 on c2.vec_id = c0.vec_id
      join c3 on c3.vec_id = c0.vec_id
      join qs t0 on t0.m = 0 and t0.cid = c0.code
      join qs t1 on t1.m = 1 and t1.cid = c1.code and t1.qa = t0.qa
      join qs t2 on t2.m = 2 and t2.cid = c2.code and t2.qa = t0.qa
      join qs t3 on t3.m = 3 and t3.cid = c3.code and t3.qa = t0.qa
      where t0.qa <> c0.vec_id
    )
    select qa, qb from adc
    qualify row_number() over (partition by qa order by score desc, qb) <= 5
    """



def q_minhash_jaccard_est() -> str:
    # estimate = fraction of equal signature components (k/32 exact in
    # double); exact = n-gram Jaccard over the candidate pairs only
    eq_terms = " + ".join(f"cast((sa.m{i} = sb.m{i}) as int)" for i in range(32))
    return f"""with {_minhash_ctes()},
    est as (
      select c.id_a, c.id_b, ({eq_terms}) / 32.0 as est_jaccard
      from cand c
      join sigs sa on sa.doc_id = c.id_a
      join sigs sb on sb.doc_id = c.id_b
    ),
    sizes as (select doc_id, count(*) as n_sh from sh group by doc_id),
    inter as (
      select a.doc_id as id_a, b.doc_id as id_b, count(*) as n_inter
      from sh a join sh b on a.shingle = b.shingle and a.doc_id < b.doc_id
      group by a.doc_id, b.doc_id
    )
    select e.id_a, e.id_b, round(e.est_jaccard, 6) as est_jaccard,
           round(coalesce(i.n_inter, 0)
                 / cast(sa.n_sh + sb.n_sh - coalesce(i.n_inter, 0) as double),
                 6) as exact_jaccard
    from est e
    left join inter i on i.id_a = e.id_a and i.id_b = e.id_b
    join sizes sa on sa.doc_id = e.id_a
    join sizes sb on sb.doc_id = e.id_b
    """



def q_ivfpq_topk() -> str:
    # IVFPQ: coarse probes (top-3 cosine centroids per query) restrict
    # the candidate lists; scoring is the PQ/ADC fixed-order lookup sum
    return """
    with cent as (select vec_id, embedding from embeddings where vec_id in (select vec_id from embeddings
        order by md5(cast(vec_id as varchar)), vec_id limit 25)),
    cent_sims as (
      select va, ccid, s_ab / (sqrt(s_aa) * sqrt(s_bb)) as sim from (
        select va, ccid, sum(xa * xb) as s_ab, sum(xa * xa) as s_aa, sum(xb * xb) as s_bb
        from (
          select a.vec_id as va, c.vec_id as ccid,
                 cast(unnest(a.embedding) as double) as xa,
                 cast(unnest(c.embedding) as double) as xb
          from embeddings a join cent c on true
        ) z group by va, ccid
      ) s
    ),
    cassign as (
      select va as qb, ccid from (
        select va, ccid, row_number() over (partition by va order by sim desc, ccid) as rn
        from cent_sims
      ) t where rn = 1
    ),
    cprobes as (
      select va as qa, ccid from (
        select va, ccid, row_number() over (partition by va order by sim desc, ccid) as rn
        from cent_sims where va < 8
      ) t where rn <= 3
    ),
    cb as (
      select vec_id as cid,
             cast(floor((r.j - 1) / 16) as bigint) as m,
             r.j as j,
             cast(embedding[r.j] as double) as val
      from embeddings cross join range(1, 65) r(j)
      where vec_id in (select vec_id from embeddings
        order by md5(cast(vec_id as varchar)), vec_id limit 25)
    ),
    cnorm as (select m, cid, sum(val * val) / 2.0 as h from cb group by m, cid),
    scores as (
      select e.vec_id, cb.m, cb.cid,
             sum(cast(e.embedding[cb.j] as double) * cb.val) as dot
      from embeddings e join cb on true
      group by e.vec_id, cb.m, cb.cid
    ),
    best as (
      select vec_id, m, cid from (
        select s.vec_id, s.m, s.cid,
               row_number() over (partition by s.vec_id, s.m
                                  order by s.dot - n.h desc, s.cid) as rn
        from scores s join cnorm n on n.m = s.m and n.cid = s.cid
      ) t where rn = 1
    ),
    c0 as (select vec_id, cid as code from best where m = 0),
    c1 as (select vec_id, cid as code from best where m = 1),
    c2 as (select vec_id, cid as code from best where m = 2),
    c3 as (select vec_id, cid as code from best where m = 3),
    qtab as (
      select q.vec_id as qa, cb.m, cb.cid,
             sum(cast(q.embedding[cb.j] as double) * cb.val) as dot
      from embeddings q join cb on true
      where q.vec_id < 8
      group by q.vec_id, cb.m, cb.cid
    ),
    qs as (
      select qa, m, cid, qtab.dot - n.h as s
      from qtab join cnorm n using (m, cid)
    ),
    adc as (
      select p.qa, a.qb, t0.s + t1.s + t2.s + t3.s as score
      from cprobes p
      join cassign a on a.ccid = p.ccid and a.qb <> p.qa
      join c0 on c0.vec_id = a.qb
      join c1 on c1.vec_id = a.qb
      join c2 on c2.vec_id = a.qb
      join c3 on c3.vec_id = a.qb
      join qs t0 on t0.m = 0 and t0.cid = c0.code and t0.qa = p.qa
      join qs t1 on t1.m = 1 and t1.cid = c1.code and t1.qa = p.qa
      join qs t2 on t2.m = 2 and t2.cid = c2.code and t2.qa = p.qa
      join qs t3 on t3.m = 3 and t3.cid = c3.code and t3.qa = p.qa
    )
    select qa, qb from adc
    qualify row_number() over (partition by qa order by score desc, qb) <= 5
    """



def q_token_overlap() -> str:
    # integer min-tf overlap + containment over the candidate pairs;
    # token frequencies from the raw (non-distinct) token stream
    return f"""with {_minhash_ctes()},
    toksall as (
      select doc_id, unnest(string_split(text, ' ')) as tok
      from documents where doc_id < 200
    ),
    tokf as (
      select doc_id, tok, count(*) as tf from toksall
      where tok <> '' group by doc_id, tok
    ),
    lens as (
      select doc_id, count(*) as n_tokens from toksall
      where tok <> '' group by doc_id
    ),
    ov as (
      select c.id_a, c.id_b, sum(least(a.tf, b.tf)) as overlap
      from cand c
      join tokf a on a.doc_id = c.id_a
      join tokf b on b.doc_id = c.id_b and b.tok = a.tok
      group by c.id_a, c.id_b
    )
    select c.id_a, c.id_b,
           cast(coalesce(o.overlap, 0) as bigint) as overlap,
           round(coalesce(o.overlap, 0) / cast(least(la.n_tokens, lb.n_tokens) as double), 6)
             as containment
    from cand c
    left join ov o on o.id_a = c.id_a and o.id_b = c.id_b
    join lens la on la.doc_id = c.id_a
    join lens lb on lb.doc_id = c.id_b
    """



def q_incremental_text_stats() -> str:
    # touched docs = portable-hash(key) % 500 over the snap_a->snap_b
    # diff; token stats only for those docs
    from lakefs_spark.functions.hashfam import X_MOD

    return with_views("snap_a", "snap_b") + f"""
    , d as ({diff_sql("snap_a", "snap_b")}),
    touched as (
      select distinct
             (cast(concat('0x', substr(md5(key), 1, 15)) as bigint) % {X_MOD}) % 500 as doc_id
      from d
    )
    select doc.doc_id, cast(length(split(doc.text, ' ')) as bigint) as n_tokens
    from documents doc join touched t on t.doc_id = doc.doc_id
    """


ORACLES: dict[str, str] = {}
PART_ORACLES: dict[str, str] = {}


def all_oracles() -> dict[str, str]:
    """Driver contract: one oracle per queries() entry — solo oracles
    pass through; gate oracles are the tagged UNION ALL of their parts
    canonicalized to (gate, row_repr) (lakefs_spark/gatespec.py)."""
    from lakefs_spark import gatespec as GS

    parts = part_oracles()
    if not ORACLES:
        ORACLES.update({name: parts[name] for name in GS.SOLO})
        for gate, members in GS.GATES.items():
            ORACLES[gate] = GS.oracle_gate(members, GS.COLSPECS, parts)
    return dict(ORACLES)


def part_oracles() -> dict[str, str]:
    if not PART_ORACLES:
        PART_ORACLES.update(
            {
                "snapshot_listing": q_snapshot_listing(),
                "list_prefix_page": q_list_prefix_page(),
                "list_delimiter_groups": q_list_delimiter_groups(),
                "list_delimiter_leaves": q_list_delimiter_leaves(),
                "overlay_visible": q_overlay_visible(),
                "uncommitted_diff": q_uncommitted_diff(),
                "diff_refs": q_diff_refs(),
                "local_sync_diff": q_local_sync_diff(),
                "sync_plan": q_sync_plan(),
                "diff_summary": q_diff_summary(),
                "compare_refs": q_compare_refs(),
                "merge_result_src": q_merge_result_src(),
                "merge_result_dest": q_merge_result_dest(),
                "merge_conflicts": q_merge_conflicts(),
                "gc_mark": q_gc_mark(),
                "gc_committed_addresses": q_gc_committed_addresses(),
                "range_stats": q_range_stats(),
                "dedup_exact": q_dedup_exact(),
                "token_counts": q_token_counts(),
                "bpe_token_counts": q_bpe_token_counts(),
                "bpe_pair_stats": q_bpe_pair_stats(),
                "vocab_stats": q_vocab_stats(),
                "dedup_clusters": q_dedup_clusters(),
                "dedup_survivors": q_dedup_survivors(),
                "substring_spans": q_substring_spans(),
                "substring_stats": q_substring_stats(),
                "substring_cut": q_substring_cut(),
                "incremental_dedup_pairs": q_incremental_dedup_pairs(),
                "corpus_funnel": q_corpus_funnel(),
                "length_percentiles": q_length_percentiles(),
                "repetition_scores": q_repetition_scores(),
                "unigram_nll": q_unigram_nll(),
                "bm25_topk": q_bm25_topk(),
                "pull_requests": q_pull_requests(),
                "branch_listing": q_branch_listing(),
                "hook_runs": q_hook_runs(),
                "webhook_deliveries": q_webhook_deliveries(),
                "action_task_results": q_action_task_results(),
                "lua_hook_runs": q_lua_hook_runs(),
                "lua_diff_delimiter": q_lua_diff_delimiter(),
                "lua_exporters": q_lua_exporters(),
                "lua_stock_validators": q_lua_stock_validators(),
                "sstable_import": q_sstable_import(),
                "audio_chunks": q_audio_chunks(),
                "line_dedup": q_line_dedup(),
                "text_normalize": q_text_normalize(),
                "url_canonical": q_url_canonical(),
                "domain_stats": q_domain_stats(),
                "point_lookup_branch": q_point_lookup_branch(),
                "list_page_probe": q_list_page_probe(),
                "run_ttl_expiry": q_run_ttl_expiry(),
                "expectation_gate": q_expectation_gate(),
                "pii_counts": q_pii_counts(),
                "sampling_weights": q_sampling_weights(),
                "dsir_weights": q_dsir_weights(),
                "dsir_top": q_dsir_top(),
                "sequence_packing": q_sequence_packing(),
                "doc_chunks": q_doc_chunks(),
                "passage_dedup": q_passage_dedup(),
                "boilerplate_strip": q_boilerplate_strip(),
                "length_band_filter": q_length_band_filter(),
                "label_centroids": q_label_centroids(),
                "prototypicality": q_prototypicality(),
                "stratified_sample": q_stratified_sample(),
                "contamination": q_contamination(),
                "bloom_decontamination": q_bloom_decontamination(),
                "quality_classifier": q_quality_classifier(),
                "token_fertility": q_token_fertility(),
                "train_val_split": q_train_val_split(),
                "text_quality": q_text_quality(),
                "incremental_text_stats": q_incremental_text_stats(),
                "lang_id": q_lang_id(),
                "doc_fingerprints": q_doc_fingerprints(),
                "ngram_jaccard": q_ngram_jaccard(),
                "cosine_pairs": q_cosine_pairs(),
                "near_dup_embeddings": q_near_dup_embeddings(),
                "embedding_dedup_survivors": q_embedding_dedup_survivors(),
                "ivf_topk": q_ivf_topk(),
                "kmeans_codebook": q_kmeans_codebook(),
                "pq_codes": q_pq_codes(),
                "pq_topk": q_pq_topk(),
                "ivfpq_topk": q_ivfpq_topk(),
                "hybrid_rerank": q_hybrid_rerank(),
                "ann_topk": q_ann_topk(),
                "ann_recall": q_ann_recall(),
                "lsh_topk": q_lsh_topk(),
                "minhash_candidates": q_minhash_candidates(),
                "minhash_jaccard_est": q_minhash_jaccard_est(),
                "token_overlap": q_token_overlap(),
                "simhash": q_simhash(),
                "simhash_near_dups": q_simhash_near_dups(),
                "import_prefix_replace": q_import_prefix_replace(),
                "symlink_manifest": q_symlink_manifest(),
                "hive_partitions": q_hive_partitions(),
                "delta_log_actions": q_delta_log_actions(),
                "glue_partition_batches": q_glue_partition_batches(),
                "unity_table_payload": q_unity_table_payload(),
                "media_frame_sample": q_media_frame_sample(),
                "media_features": q_media_features(),
                "media_resize": q_media_resize(),
                "gc_key_match": q_gc_key_match(),
                "path_time_prune": q_path_time_prune(),
                "windowed_event_counts": q_windowed_event_counts(),
                "session_event_stats": q_session_event_stats(),
                "stream_session_stats": q_stream_session_stats(),
                "asof_click_attribution": q_asof_click_attribution(),
                "range_join_acctbal": q_range_join_acctbal(),
                "sliding_event_counts": q_sliding_event_counts(),
                "event_time_rollup": q_event_time_rollup(),
                "commit_log": q_commit_log(),
                "commit_log_since": q_commit_log_since(),
                "commit_log_first_parent": q_commit_log_first_parent(),
                "merge_base": q_merge_base(),
                "ref_resolve": q_ref_resolve(),
                "gc_summary": q_gc_summary(),
                "active_commits": q_active_commits(),
                "walker_entries": q_walker_entries(),
                "s3_list_pages": q_s3_list_pages(),
                "s3_list_v1_pages": q_s3_list_v1_pages(),
                "repo_squash_merge_snapshot": q_repo_squash_merge_snapshot(),
                "repo_revert_merge_snapshot": q_repo_revert_merge_snapshot(),
                "repo_copy_entry_snapshot": q_repo_copy_entry_snapshot(),
                "repo_uncommitted_compacted": q_repo_uncommitted_compacted(),
                "commit_ordered": q_commit_ordered(),
                "stream_ingest_snapshot": q_stream_ingest_snapshot(),
                "tombstone_alert_stream": q_tombstone_alert_stream(),
                "stream_dedup_hashes": q_stream_dedup_hashes(),
                "csv_source": q_csv_source(),
                "json_source": q_json_source(),
                "binary_file_source": q_binary_file_source(),
                "orc_source": q_orc_source(),
                "packing_efficiency": q_packing_efficiency(),
                "repo_commit_snapshot": q_repo_commit_snapshot(),
                "repo_revert_snapshot": q_repo_revert_snapshot(),
                "repo_cherry_pick_snapshot": q_repo_cherry_pick_snapshot(),
                "repo_merge_snapshot": q_repo_merge_snapshot(),
                "repo_reset_prefix_snapshot": q_repo_reset_prefix_snapshot(),
                "repo_conditional_set_snapshot": q_repo_conditional_set_snapshot(),
                "repo_compact_snapshot": q_repo_compact_snapshot(),
                "repo_restore_snapshot": q_repo_restore_snapshot(),
                "repo_log_paths": q_repo_log_paths(),
                "repo_annotate": q_repo_annotate(),
                "usage_report": q_usage_report(),
                "multipart_etags": q_multipart_etags(),
                "point_lookup": q_point_lookup(),
                "uncommitted_addresses": q_uncommitted_addresses(),
            }
        )
    return dict(PART_ORACLES)
