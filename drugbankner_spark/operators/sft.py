"""SFT (instruction-tuning) data preparation (E5-adjacent, round 5
late): turn event-shaped rows into rendered chat-template strings plus
the assistant-span offsets a trainer needs for loss masking.

Everything is higher-order column expressions — per-conversation
ordering happens inside ``array_sort`` over collected structs (one
shuffle on the conversation key; turn lists are conversation-sized, so
no skewed reducer), and the span prefix-sum runs as an ``aggregate``
fold over the turn array, not a window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: ChatML-flavored default template parts.
ROLE_OPEN = {"user": "<|user|>\n", "assistant": "<|assistant|>\n",
             "system": "<|system|>\n"}
TURN_CLOSE = "<|end|>\n"


def render_preference_pairs(
    pairs: DataFrame,
    prompt_col: str = "prompt",
    chosen_col: str = "chosen",
    rejected_col: str = "rejected",
) -> DataFrame:
    """DPO/RLHF preference-data prep: each (prompt, chosen, rejected)
    row becomes two fully rendered single-turn conversations sharing
    the prompt prefix — the exact input a preference trainer consumes.
    Emits the shared-prefix length so the trainer can skip re-encoding
    the prompt. Pure string expressions, zero shuffle."""
    def render(resp_col: str) -> F.Column:
        return F.concat(
            F.lit(ROLE_OPEN["user"]), F.col(prompt_col),
            F.lit(TURN_CLOSE), F.lit(ROLE_OPEN["assistant"]),
            F.col(resp_col), F.lit(TURN_CLOSE),
        )

    prefix_len = (
        F.length(F.lit(ROLE_OPEN["user"])) + F.length(F.col(prompt_col))
        + F.length(F.lit(TURN_CLOSE))
        + F.length(F.lit(ROLE_OPEN["assistant"]))
    )
    return pairs.select(
        "*",
        render(chosen_col).alias("rendered_chosen"),
        render(rejected_col).alias("rendered_rejected"),
        prefix_len.cast("long").alias("shared_prefix_len"),
    )


def render_chat(
    turns: DataFrame,
    conv_col: str = "conversation_id",
    order_cols: tuple[str, str] = ("ts", "event_id"),
    role_col: str = "role",
    content_col: str = "content",
    with_spans: bool = False,
) -> DataFrame:
    """One row per conversation: (conv, n_turns, rendered) — turns
    sorted by ``order_cols`` (the tiebreak column makes the order
    total, so rendering is partition-invariant), each wrapped in its
    role markers. ``with_spans=True`` adds ``assistant_spans``:
    [(start, end)) char offsets of each assistant CONTENT inside
    ``rendered`` — the loss-mask input (train on assistant tokens
    only), computed by an aggregate prefix fold over the same sorted
    array, no second pass over text."""
    o1, o2 = order_cols
    sorted_turns = F.array_sort(
        F.collect_list(F.struct(
            F.col(o1).alias("_o1"), F.col(o2).alias("_o2"),
            F.col(role_col).alias("role"),
            F.col(content_col).alias("content"),
        ))
    )
    role_open = F.create_map(*[
        x for k, v in ROLE_OPEN.items() for x in (F.lit(k), F.lit(v))
    ])

    def piece(t):
        return F.concat(
            F.coalesce(role_open[t["role"]], F.concat(F.lit("<|"),
                       t["role"], F.lit("|>\n"))),
            t["content"], F.lit(TURN_CLOSE),
        )

    grouped = turns.groupBy(F.col(conv_col)).agg(
        sorted_turns.alias("_turns")
    )
    rendered = F.array_join(
        F.transform(F.col("_turns"), piece), ""
    )
    out = grouped.select(
        F.col(conv_col),
        F.size("_turns").alias("n_turns"),
        rendered.alias("rendered"),
        *( [F.aggregate(
            F.col("_turns"),
            F.struct(
                F.lit(0).cast("long").alias("off"),
                F.array().cast(
                    "array<struct<start:bigint,end:bigint>>"
                ).alias("spans"),
            ),
            lambda acc, t: F.struct(
                (acc["off"]
                 + F.length(F.coalesce(role_open[t["role"]],
                            F.concat(F.lit("<|"), t["role"],
                                     F.lit("|>\n"))))
                 + F.length(t["content"])
                 + F.length(F.lit(TURN_CLOSE))).alias("off"),
                F.when(
                    t["role"] == "assistant",
                    F.concat(acc["spans"], F.array(F.struct(
                        (acc["off"] + F.length(F.coalesce(
                            role_open[t["role"]],
                            F.concat(F.lit("<|"), t["role"],
                                     F.lit("|>\n"))))).alias("start"),
                        (acc["off"] + F.length(F.coalesce(
                            role_open[t["role"]],
                            F.concat(F.lit("<|"), t["role"],
                                     F.lit("|>\n"))))
                         + F.length(t["content"])).alias("end"),
                    ))),
                ).otherwise(acc["spans"]).alias("spans"),
            ),
            lambda acc: acc["spans"],
        ).alias("assistant_spans")] if with_spans else [] ),
    )
    return out


def span_corrupt(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    every_k: int = 7,
    max_span: int = 3,
    kernel: str = "md5",
) -> DataFrame:
    """T5-style span corruption (Raffel et al. 2020 §3.1.4), made
    DETERMINISTIC: instead of sampling spans, token position ``p``
    starts a noise span iff ``hash32(id:p) % every_k == 0``, with span
    length ``1 + hash32(id#p) % max_span``; overlapping spans merge
    (gaps-and-islands), and each merged span becomes ``<extra_id_n>``
    in the inputs with the removed tokens behind the same sentinel in
    the targets — the standard denoising-objective rendering, but
    reproducible across engines, partitionings, and reruns (the same
    hash-not-RNG convention as every sampler in this repo).

    Output: (id, inputs, targets, n_spans, n_noise_tokens); untouched
    docs get their original text, empty targets, 0 spans.

    Shape: one token explode + per-doc windows for the island merge +
    a bounded range join (tokens x merged spans WITHIN a doc) + two
    ordered reassembly aggs — everything keys on the doc id, so at
    100 TB it partitions like every other corpus op and the range join
    never crosses documents."""
    from pyspark.sql import Window

    from drugbankner_spark.operators.dedup import content_hash32

    toks_pos = (
        docs.select(
            F.col(id_col),
            F.split(F.col(text_col), " ").alias("_tk"),
        )
        .select(
            id_col,
            F.size("_tk").alias("_n"),
            F.posexplode("_tk").alias("_p0", "tok"),
        )
        .select(
            id_col, "_n", "tok", (F.col("_p0") + 1).alias("p")
        )
    )
    idc = F.col(id_col).cast("string")
    h_start = content_hash32(
        F.concat(idc, F.lit(":"), F.col("p").cast("string")), kernel
    )
    h_len = content_hash32(
        F.concat(idc, F.lit("#"), F.col("p").cast("string")), kernel
    )
    starts = toks_pos.filter(h_start % every_k == 0).select(
        id_col,
        F.col("p").alias("s"),
        F.least(F.col("p") + h_len % max_span, F.col("_n")).alias("e"),
    )
    w = Window.partitionBy(id_col).orderBy("s", "e")
    prev_max_e = F.max("e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = starts.withColumn(
        "_new", F.when(
            F.col("s") > F.coalesce(prev_max_e, F.lit(0)), 1
        ).otherwise(0),
    )
    islands = flagged.withColumn(
        "island",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    ).groupBy(id_col, "island").agg(
        F.min("s").alias("s"), F.max("e").alias("e")
    )
    sentinel = F.concat(
        F.lit("<extra_id_"), (F.col("island") - 1).cast("string"),
        F.lit(">"),
    )
    isl = islands.select(
        F.col(id_col).alias("_iid"), "island", "s", "e"
    )
    cov = toks_pos.join(
        isl,
        (toks_pos[id_col] == isl["_iid"])
        & (F.col("p") >= F.col("s")) & (F.col("p") <= F.col("e")),
        "left",
    ).select(
        toks_pos[id_col].alias("_id"), "p", "tok", "s", "e", "island"
    )
    piece = (
        F.when(F.col("s").isNull(), F.col("tok"))
        .when(F.col("p") == F.col("s"),
              F.concat(F.lit("<extra_id_"),
                       (F.col("island") - 1).cast("string"), F.lit(">")))
    )
    inputs = (
        cov.withColumn("_piece", piece)
        .filter(F.col("_piece").isNotNull())
        .groupBy("_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(
                        F.struct("p", "_piece"))),
                    lambda x: x["_piece"],
                ), " ",
            ).alias("inputs")
        )
    )
    spans = (
        cov.filter(F.col("s").isNotNull())
        .groupBy("_id", "island", "s")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("p", "tok"))),
                    lambda x: x["tok"],
                ), " ",
            ).alias("_span_text"),
            F.count(F.lit(1)).alias("_span_len"),
        )
    )
    targets = spans.groupBy("_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct(
                    "island",
                    F.concat(
                        F.lit("<extra_id_"),
                        (F.col("island") - 1).cast("string"),
                        F.lit("> "), F.col("_span_text"),
                    ).alias("t"),
                ))),
                lambda x: x["t"],
            ), " ",
        ).alias("targets"),
        F.count(F.lit(1)).alias("n_spans"),
        F.sum("_span_len").alias("n_noise_tokens"),
    )
    return (
        inputs.join(targets, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            "inputs",
            F.coalesce("targets", F.lit("")).alias("targets"),
            F.coalesce("n_spans", F.lit(0)).cast("int").alias("n_spans"),
            F.coalesce("n_noise_tokens", F.lit(0)).cast("int")
            .alias("n_noise_tokens"),
        )
    )


def fim_transform(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "fim-1",
    mode: str = "psm",
) -> DataFrame:
    """Fill-in-the-Middle pretraining transform (Bavarian et al. 2022,
    "Efficient Training of Language Models to Fill in the Middle"),
    made DETERMINISTIC: two hash-drawn token cut points split each
    document into (prefix, middle, suffix), re-rendered with the FIM
    sentinels in PSM order — ``<PRE> prefix <SUF> suffix <MID>
    middle`` — or SPM (``mode="spm"``). The fourth denoising face
    next to T5 span corruption (:func:`span_corrupt`): FIM teaches
    infilling while preserving the left-to-right loss on every token,
    which is why code models train on it.

    Cut points come from the engine's hash-not-RNG convention:
    ``a = 1 + hash32(id:salt:a) % n`` and ``b = 1 + hash32(id:salt:b)
    % n`` over the n token boundaries, ordered so prefix =
    tokens[1..min), middle = tokens[min..max), suffix = tokens[max..].
    Degenerate draws (a == b → empty middle) stay as drawn — the
    published recipe keeps empty-middle examples. Single-token and
    empty docs emit with whatever the draw yields on their tiny n.

    Pure per-row expressions (split, two hashes, three slices, one
    concat): zero shuffle, scan throughput, exact in both engines.
    Output: (id, text_fim, n_prefix, n_middle, n_suffix)."""
    from drugbankner_spark.operators.dedup import content_hash32

    if mode not in ("psm", "spm"):
        raise ValueError("fim_transform: mode must be 'psm' or 'spm'")
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    ha = content_hash32(
        F.concat_ws(":", F.col(id_col).cast("string"),
                    F.lit(salt), F.lit("a"))
    )
    hb = content_hash32(
        F.concat_ws(":", F.col(id_col).cast("string"),
                    F.lit(salt), F.lit("b"))
    )
    pre = docs.select(
        F.col(id_col), toks.alias("_toks"), n.alias("_n"),
        (F.lit(1) + F.pmod(ha, F.greatest(n, F.lit(1)))).alias("_ca"),
        (F.lit(1) + F.pmod(hb, F.greatest(n, F.lit(1)))).alias("_cb"),
    ).select(
        id_col, "_toks", "_n",
        F.least("_ca", "_cb").alias("_lo"),
        F.greatest("_ca", "_cb").alias("_hi"),
    )
    prefix = F.array_join(F.expr("slice(_toks, 1, _lo - 1)"), " ")
    middle = F.array_join(
        F.expr("slice(_toks, _lo, _hi - _lo)"), " "
    )
    suffix = F.array_join(
        F.expr("slice(_toks, _hi, _n - _hi + 1)"), " "
    )
    if mode == "psm":
        rendered = F.concat(
            F.lit("<PRE>"), prefix, F.lit("<SUF>"), suffix,
            F.lit("<MID>"), middle,
        )
    else:
        rendered = F.concat(
            F.lit("<SUF>"), suffix, F.lit("<PRE>"), prefix,
            F.lit("<MID>"), middle,
        )
    return pre.select(
        F.col(id_col),
        rendered.alias("text_fim"),
        (F.col("_lo") - 1).cast("int").alias("n_prefix"),
        (F.col("_hi") - F.col("_lo")).cast("int").alias("n_middle"),
        (F.col("_n") - F.col("_hi") + 1).cast("int").alias("n_suffix"),
    )


def spans_to_iob(
    docs: DataFrame,
    spans: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    start_col: str = "start",
    length_col: str = "length",
    label_col: str = "label",
) -> DataFrame:
    """Character spans → token-level IOB tags (the rendering step
    between span annotations — dictionary taggers, the NER UDTF — and
    a token-classification trainer). Whitespace tokens; a token joins
    the span that covers its START character; the span's first token
    is ``B-label``, the rest ``I-label``, everything else ``O``.

    Overlap resolution is DETERMINISTIC and documented: a span is
    dropped iff it overlaps another span of the same doc with higher
    priority (longer first, then earlier start, then label asc) — one
    in-doc pair join + anti-join, no sequential dependence (a span
    dropped this way does not revive spans it overlapped; the greedy
    optimum would need a sequential scan and buys nothing for
    training data). Output: (id, pos, token, tag), pos 1-based.

    Shape: token offsets from one per-doc prefix-sum window, span
    priority from one bounded in-doc pair join, tagging from one
    range join (tokens × surviving spans WITHIN a doc) + a first-token
    window — everything keys on the doc id."""
    from pyspark.sql import Window

    toks = (
        docs.select(
            F.col(id_col), F.split(F.col(text_col), " ").alias("_tk")
        )
        .select(
            id_col,
            F.posexplode("_tk").alias("_p0", "token"),
        )
        .select(
            F.col(id_col).alias("_d"), "token",
            (F.col("_p0") + 1).alias("pos"),
        )
    )
    w_off = Window.partitionBy("_d").orderBy("pos")
    toks = toks.withColumn(
        "tok_start",
        F.coalesce(
            F.sum(F.length("token") + 1).over(
                w_off.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )
    s = spans.select(
        F.col(id_col).alias("_sd"),
        F.col(start_col).alias("s_start"),
        F.col(length_col).alias("s_len"),
        F.col(label_col).alias("s_label"),
    ).distinct()
    other = s.select(
        F.col("_sd").alias("_od"), F.col("s_start").alias("o_start"),
        F.col("s_len").alias("o_len"), F.col("s_label").alias("o_label"),
    )
    overlapped = s.join(
        other,
        (F.col("_sd") == F.col("_od"))
        & (F.col("s_start") < F.col("o_start") + F.col("o_len"))
        & (F.col("o_start") < F.col("s_start") + F.col("s_len"))
        & (
            (F.col("o_len") > F.col("s_len"))
            | ((F.col("o_len") == F.col("s_len"))
               & (F.col("o_start") < F.col("s_start")))
            | ((F.col("o_len") == F.col("s_len"))
               & (F.col("o_start") == F.col("s_start"))
               & (F.col("o_label") < F.col("s_label")))
        ),
        "left_semi",
    )
    kept = s.join(
        overlapped, ["_sd", "s_start", "s_len", "s_label"], "left_anti"
    )
    tagged = toks.join(
        kept,
        (F.col("_d") == F.col("_sd"))
        & (F.col("tok_start") >= F.col("s_start"))
        & (F.col("tok_start") < F.col("s_start") + F.col("s_len")),
        "left",
    )
    w_span = Window.partitionBy("_d", "s_start", "s_len").orderBy(
        "tok_start"
    )
    tag = F.when(F.col("s_label").isNull(), F.lit("O")).when(
        F.row_number().over(w_span) == 1,
        F.concat(F.lit("B-"), F.col("s_label")),
    ).otherwise(F.concat(F.lit("I-"), F.col("s_label")))
    return tagged.select(
        F.col("_d").alias(id_col), "pos", "token", tag.alias("tag")
    )
