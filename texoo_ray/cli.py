"""Command-line entry points (the analogue of the reference's bin/ scripts:
texoo-annotate-ner -> ``annotate``, RunSectorAnnotator -> ``--sections``,
plus corpus generation and resumable runs).

Usage::

    python -m texoo_ray.cli annotate --input DIR_OR_PARQUET --output DIR
        [--gazetteer terms.txt] [--sections nl|emd|bemd] [--no-sort]
        [--resume --partitions 16]
    python -m texoo_ray.cli generate --output DIR --convs 10000
    python -m texoo_ray.cli eval-ner --input PARQUET  # gold vs pred columns
    python -m texoo_ray.cli curate --input PARQUET_DIR --output DIR
        [--min-words 5] [--no-alpha-gate]
    python -m texoo_ray.cli extract-html --input PARQUET_DIR --output DIR
        [--html-col html] [--keep-headings]

Owns its Ray session (guarded init), unlike the library code.
"""

from __future__ import annotations

import argparse
import json
import sys


def _init_ray(num_cpus=None):
    import os

    import ray

    if not ray.is_initialized():
        # Honor the ambient cluster address (ray job submit sets
        # RAY_ADDRESS to the cluster); fall back to a local session so
        # the CLI also works standalone on one machine.
        kwargs = dict(
            address=os.environ.get("RAY_ADDRESS", "local"),
            include_dashboard=False,
            logging_level="ERROR",
        )
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False


def cmd_annotate(args) -> int:
    _init_ray(args.num_cpus)
    terms = None
    if args.gazetteer:
        with open(args.gazetteer, encoding="utf-8") as f:
            terms = [line.strip() for line in f if line.strip()]
    kwargs = dict(
        gazetteer_terms=terms,
        section_method=args.sections,
        newlines=args.newlines,
    )
    if args.resume:
        import glob
        import os

        from .pipelines.extract import run_extract_resumable

        files = sorted(glob.glob(os.path.join(args.input, "*.parquet")))
        res = run_extract_resumable(
            files,
            args.output,
            num_partitions=args.partitions,
            sort_output=not args.no_sort,
            **kwargs,
        )
        print(json.dumps(res))
    else:
        from .pipelines.extract import run_extract

        rows = run_extract(
            args.input, args.output, sort_output=not args.no_sort, **kwargs
        )
        print(json.dumps({"rows": rows, "output": args.output}))
    return 0


def cmd_generate(args) -> int:
    _init_ray(args.num_cpus)
    from .sources.turns import write_turns_corpus

    rows = write_turns_corpus(
        args.output, args.convs, seed=args.seed, num_files=args.files
    )
    print(json.dumps({"rows": rows, "output": args.output}))
    return 0


def cmd_eval_ner(args) -> int:
    _init_ray(args.num_cpus)
    import ray.data

    from .pipelines.evaluate import ner_eval

    ds = ray.data.read_parquet(args.input)
    res = ner_eval(ds, gold_col=args.gold_col, pred_col=args.pred_col)
    print(json.dumps(res))
    return 0


def cmd_curate(args) -> int:
    """Training-data curation pass: quality gate -> keep-first exact
    dedup (pipelines/curation.py) -> parquet of surviving doc stats."""
    _init_ray(args.num_cpus)
    import ray.data

    from .pipelines.curation import curate_corpus

    ds = ray.data.read_parquet(args.input, columns=[args.id_col, args.text_col])
    out = curate_corpus(
        ds,
        text_col=args.text_col,
        id_col=args.id_col,
        min_words=args.min_words,
        min_alpha_ratio_x2=not args.no_alpha_gate,
    )
    out.write_parquet(args.output)
    import pyarrow.dataset as pads

    print(json.dumps({"rows": pads.dataset(args.output).count_rows(), "output": args.output}))
    return 0


def cmd_extract_html(args) -> int:
    """Main-content extraction over an html column -> parquet with
    title/main_text/boilerplate counters (stages/extract_html.py)."""
    _init_ray(args.num_cpus)
    import ray.data

    from .stages.extract_html import MainContentStage

    ds = ray.data.read_parquet(args.input)
    out = ds.map_batches(
        MainContentStage,
        fn_constructor_kwargs=dict(
            html_col=args.html_col, include_headings=args.keep_headings
        ),
        batch_format="pyarrow",
        batch_size=args.batch_size,
        concurrency=args.concurrency,
    )
    out.write_parquet(args.output)
    import pyarrow.dataset as pads

    print(json.dumps({"rows": pads.dataset(args.output).count_rows(), "output": args.output}))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="texoo_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    pa_ = sub.add_parser("annotate", help="extract spans/mentions/sections from turns parquet")
    pa_.add_argument("--input", required=True)
    pa_.add_argument("--output", required=True)
    pa_.add_argument("--gazetteer", help="term list file (one term per line)")
    pa_.add_argument("--sections", default="nl", choices=["nl", "emd", "bemd"])
    pa_.add_argument("--newlines", default="keep", choices=["keep", "discard"])
    pa_.add_argument("--no-sort", action="store_true")
    pa_.add_argument("--resume", action="store_true", help="per-partition lineage + skip completed")
    pa_.add_argument("--partitions", type=int, default=16)
    pa_.add_argument("--num-cpus", type=int, dest="num_cpus")
    pa_.set_defaults(fn=cmd_annotate)

    pg = sub.add_parser("generate", help="write a deterministic synthetic turns corpus")
    pg.add_argument("--output", required=True)
    pg.add_argument("--convs", type=int, default=1000)
    pg.add_argument("--seed", type=int, default=42)
    pg.add_argument("--files", type=int, default=64)
    pg.add_argument("--num-cpus", type=int, dest="num_cpus")
    pg.set_defaults(fn=cmd_generate)

    pe = sub.add_parser("eval-ner", help="P/R/F1 from gold/pred mention columns")
    pe.add_argument("--input", required=True)
    pe.add_argument("--gold-col", default="gold_mentions")
    pe.add_argument("--pred-col", default="mentions")
    pe.add_argument("--num-cpus", type=int, dest="num_cpus")
    pe.set_defaults(fn=cmd_eval_ner)

    pc_ = sub.add_parser("curate", help="quality gate + keep-first dedup over documents parquet")
    pc_.add_argument("--input", required=True)
    pc_.add_argument("--output", required=True)
    pc_.add_argument("--text-col", default="text")
    pc_.add_argument("--id-col", default="doc_id")
    pc_.add_argument("--min-words", type=int, default=5)
    pc_.add_argument("--no-alpha-gate", action="store_true")
    pc_.add_argument("--num-cpus", type=int, dest="num_cpus")
    pc_.set_defaults(fn=cmd_curate)

    ph = sub.add_parser("extract-html", help="main-content extraction over an html column")
    ph.add_argument("--input", required=True)
    ph.add_argument("--output", required=True)
    ph.add_argument("--html-col", default="html")
    ph.add_argument("--keep-headings", action="store_true")
    ph.add_argument("--batch-size", type=int, default=256)
    ph.add_argument("--concurrency", type=int, default=2)
    ph.add_argument("--num-cpus", type=int, dest="num_cpus")
    ph.set_defaults(fn=cmd_extract_html)

    args = p.parse_args(argv)
    try:
        return args.fn(args)
    finally:
        import ray

        if ray.is_initialized():
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
