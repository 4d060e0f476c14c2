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
