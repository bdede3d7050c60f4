"""RAG ask-prompt assembly — km-v1's AskAsync chain composed.

SearchClient.AskStreamingAsync (archived/km-v1/service/Core/Search/
SearchClient.cs:195-275) + AnswerGenerator.PreparePrompt (Core/Search/
AnswerGenerator.cs:122-136):

1. retrieval: GetSimilarListAsync == cosine KNN with filters +
   min-relevance, limit = MaxMatchesCount (SearchClientConfig.cs:28: 100);
2. ProcessMemoryRecord: empty partitions skipped (:292-296), duplicate
   fact texts skipped unless IncludeDuplicateFacts, each record rendered
   through FactTemplate (SearchClientConfig.cs:54) with a trailing newline
   appended when missing (:242);
3. token budget: tokensAvailable = maxTokens - tokens(answer_prompt)
   - tokens(question) - AnswerTokens (:218-222); facts accumulate in
   relevance order while they fit;
4. prompt: the default RAG template (Core/Prompts/answer-with-facts.txt)
   with {{$facts}}/{{$input}}/{{$notFound}} substituted; the question is
   trimmed and gets a trailing '?' when missing (AnswerGenerator.cs:127-134).

The LLM generation step itself is out of engine scope (ITextGenerator is a
pluggable pandas-UDF factory); this operator produces the exact prompt the
reference would send. Everything is column math over the top-k matches —
one KNN scan + a bounded window, no Python in the hot path.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kernel_memory_spark.operators import query as qry
from kernel_memory_spark.operators import search_text as st

# SearchClientConfig.cs defaults
DEFAULT_MAX_MATCHES = 100          # :28
DEFAULT_EMPTY_ANSWER = "INFO NOT FOUND"  # :41
DEFAULT_FACT_TEMPLATE = (
    "==== [File:{{$source}};Relevance:{{$relevance}}]:\n{{$content}}"  # :54
)
# Core/Prompts/answer-with-facts.txt, verbatim
DEFAULT_ANSWER_PROMPT = (
    "Facts:\n"
    "{{$facts}}\n"
    "======\n"
    "Given only the facts above, provide a comprehensive/detailed answer.\n"
    "You don't know where the knowledge comes from, just answer.\n"
    "If you don't have sufficient information, reply with '{{$notFound}}'.\n"
    "Question: {{$input}}\n"
    "Answer: "
)


def _count_tokens_str(s: str, chars_per_token: int = 4) -> int:
    """Driver-side token count for the fixed strings (template, question);
    matches the engine's N-char test tokenizer."""
    import math

    return math.ceil(len(s) / chars_per_token)


def ask_facts(
    records: DataFrame,
    question_vector: List[float],
    question: str,
    filters: Optional[Sequence[qry.MemoryFilter]] = None,
    min_relevance: float = 0.0,
    limit: int = DEFAULT_MAX_MATCHES,
    fact_template: str = DEFAULT_FACT_TEMPLATE,
    answer_prompt: str = DEFAULT_ANSWER_PROMPT,
    answer_tokens: int = 300,
    max_prompt_tokens: int = 8192,
    include_duplicate_facts: bool = False,
    chars_per_token: int = 4,
) -> DataFrame:
    """-> (id, doc_id, relevance, fact, token_count) of the facts that fit
    the prompt budget, in relevance order (the reference's grounding set)."""
    if not fact_template.endswith("\n"):
        fact_template += "\n"  # SearchClient.cs:242
    budget = (
        max_prompt_tokens
        - _count_tokens_str(answer_prompt, chars_per_token)
        - _count_tokens_str(question, chars_per_token)
        - answer_tokens
    )  # SearchClient.cs:218-222

    matches = qry.knn_top_k(
        records, question_vector, k=limit,
        min_relevance=min_relevance, filters=filters,
    ).withColumnRenamed("score", "relevance")
    # ProcessMemoryRecord: skip empty partitions (:292-296)
    matches = matches.withColumn(
        "__text", F.trim(F.col("payload.text"))
    ).filter(F.length("__text") > 0)
    if not include_duplicate_facts:
        matches = st.dedupe_facts(
            matches.withColumn("score", F.col("relevance")), text_col="__text"
        ).drop("score")
    rendered = st.render_facts(
        matches.withColumn("source", F.col("payload.file"))
        .withColumn("relevance", F.round("relevance", 6))
        # {{$relevance}} renders as percent, 1 decimal — the reference's
        # recordRelevance.ToString("P1") (SearchClient.cs:336), en-US style
        .withColumn(
            "__rel_pct",
            F.format_string("%.1f%%", F.col("relevance") * 100),
        ),
        template=fact_template,
        source_col="source", relevance_col="__rel_pct", content_col="__text",
    ).withColumn(
        "token_count",
        F.ceil(F.length("fact") / F.lit(float(chars_per_token))).cast("int"),
    )
    # strict: the reference STOPS when a fact's size >= tokens available
    # (SearchClient.cs:341-346), i.e. the kept prefix satisfies cum < budget
    kept = st.take_within_token_budget(
        rendered, budget, [F.desc("relevance"), F.asc("id")], strict=True
    )
    return kept.select("id", "doc_id", "relevance", "fact", "token_count")


def ask_prompt(
    records: DataFrame,
    question_vector: List[float],
    question: str,
    empty_answer: str = DEFAULT_EMPTY_ANSWER,
    answer_prompt: str = DEFAULT_ANSWER_PROMPT,
    **kwargs,
) -> DataFrame:
    """-> one row (prompt, n_facts): the exact LLM prompt the reference
    builds. An empty grounding set still renders (the generator then
    returns the configured empty answer)."""
    facts = ask_facts(
        records, question_vector, question,
        answer_prompt=answer_prompt, **kwargs,
    )
    q = question.strip()
    if not q.endswith("?"):
        q += "?"  # AnswerGenerator.cs:127-128
    joined = facts.orderBy(F.desc("relevance"), F.asc("id")).agg(
        F.concat_ws("", F.collect_list("fact")).alias("facts"),
        F.count("*").alias("n_facts"),
    )
    prompt = (
        F.lit(answer_prompt)
        .alias("p")
    )
    return joined.select(
        F.replace(
            F.replace(
                F.replace(prompt, F.lit("{{$facts}}"), F.trim("facts")),
                F.lit("{{$input}}"), F.lit(q),
            ),
            F.lit("{{$notFound}}"), F.lit(empty_answer),
        ).alias("prompt"),
        "n_facts",
    )
