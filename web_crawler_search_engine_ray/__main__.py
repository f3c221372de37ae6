"""CLI entry points — the reference's start_crawler.py / start_indexer.py /
start_search_engine.py (web UI replaced by a terminal REPL/one-shot query)
as subcommands:

    python -m web_crawler_search_engine_ray crawl  --web-dir W --workdir D [--resume]
    python -m web_crawler_search_engine_ray index  --pages D/pages --out I
    python -m web_crawler_search_engine_ray search --index I --query "..." [-k 5]
    python -m web_crawler_search_engine_ray genweb --out W --docs 1000 --hosts 8
    python -m web_crawler_search_engine_ray query  doc_surprisal --sf-dir SF [--out P]

This script OWNS its Ray session (ray.init guard) — library code never does.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _ensure_ray():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def cmd_genweb(args) -> int:
    from .sources.synthetic_web import generate_and_write

    tables = generate_and_write(
        args.out,
        seed=args.seed,
        num_hosts=args.hosts,
        num_docs=args.docs,
        extra_links=args.extra_links,
        words_scale=args.words_scale,
    )
    print(
        json.dumps(
            {name: t.num_rows for name, t in tables.items()} | {"out": args.out}
        )
    )
    return 0


def cmd_crawl(args) -> int:
    import pyarrow.parquet as pq

    from .pipelines.crawl import run_crawl
    from .sources.synthetic_web import CrawlConfig

    _ensure_ray()
    http_mode = args.transport == "http"
    if http_mode:
        # real-network transport: robots.txt fetched per host by the robots
        # shards; seeds must come from --seeds; --root-domains scopes the
        # crawl (reference config.ini ROOT_DOMAINS)
        if not args.seeds:
            print("crawl --transport http requires --seeds", file=sys.stderr)
            return 2
        robots, docs_path = {}, None
    else:
        if not args.web_dir:
            print("crawl --transport store requires --web-dir", file=sys.stderr)
            return 2
        robots_tbl = pq.read_table(os.path.join(args.web_dir, "robots.parquet"))
        robots = {r["host"]: r["body"] for r in robots_tbl.to_pylist()}
        docs_path = os.path.join(args.web_dir, "docs.parquet")
    seeds = (
        args.seeds.split(",")
        if args.seeds
        else pq.read_table(os.path.join(args.web_dir, "seeds.parquet"))
        .column("url")
        .to_pylist()
    )
    cfg_kw = dict(wave_span=args.wave_span, politeness=args.politeness)
    if args.root_domains:
        cfg_kw["root_domains"] = tuple(args.root_domains.split(","))
    config = CrawlConfig(**cfg_kw)
    out = run_crawl(
        docs_path=docs_path,
        robots_bodies=robots,
        seed_urls=seeds,
        config=config,
        workdir=args.workdir,
        resume=args.resume,
        fetch_transport=args.transport,
        http_options={"timeout": args.http_timeout},
    )
    print(
        json.dumps(
            {
                "pages_fetched": out.pages_fetched,
                "urls_discovered": out.urls_discovered,
                "waves": out.waves,
                "workdir": out.workdir,
                "phase_seconds": (out.metrics or {}).get("phase_seconds", {}),
            }
        )
    )
    return 0


def cmd_index(args) -> int:
    from .pipelines.index_pipeline import build_index

    _ensure_ray()
    paths = build_index(args.pages, args.out, min_ngram_df=args.min_ngram_df)
    print(
        json.dumps(
            {
                "n_indexed": paths.n_indexed,
                "postings": paths.postings,
                "catalog": paths.catalog,
                "duplicates": paths.duplicates,
            }
        )
    )
    return 0


def cmd_query(args) -> int:
    """Run any registered pipeline operator by name over an sf-table dir
    (the same registry the driver contract exposes via __ray_entry__.py's
    queries()); write parquet with --out, else print the head."""
    import importlib.util

    entry_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "__ray_entry__.py",
    )
    if not os.path.exists(entry_path):
        print("error: __ray_entry__.py not found next to the package", file=sys.stderr)
        return 2
    _ensure_ray()
    spec = importlib.util.spec_from_file_location("__wcse_entry__", entry_path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    registry = mod.queries()
    if args.list or args.name is None:
        for n in registry:
            print(n)
        return 0
    if args.name not in registry:
        print(f"error: unknown query {args.name!r} (use --list)", file=sys.stderr)
        return 2
    import ray.data

    res = registry[args.name](args.sf_dir)
    if not isinstance(res, ray.data.Dataset):
        import pyarrow as pa

        tbl = res if isinstance(res, pa.Table) else pa.Table.from_pandas(res)
        res = ray.data.from_arrow(tbl)
    if args.out:
        # Snapshot pre-existing files: write_parquet APPENDS uniquely-named
        # files into an existing dir, so a rerun would otherwise double the
        # footer-summed row count with the previous run's output.
        def _parquet_files(d: str) -> set:
            found = set()
            for root, _dirs, files in os.walk(d):
                for f in files:
                    if f.endswith(".parquet"):
                        found.add(os.path.join(root, f))
            return found

        before = _parquet_files(args.out) if os.path.isdir(args.out) else set()
        res.write_parquet(args.out)
        # Row count from the NEW files' parquet footers: counting via
        # res.count() would re-execute the whole (lazy) pipeline a
        # second time — doubly expensive for multi-pass operators.
        import pyarrow.parquet as pq

        n = sum(
            pq.read_metadata(f).num_rows
            for f in _parquet_files(args.out) - before
        )
        print(json.dumps({"query": args.name, "rows": n, "out": args.out}))
    else:
        # take(head) pulls only the displayed rows to the driver; no
        # pandas materialization of the dataset.
        print(_format_rows(res.take(args.head)))
    return 0


def _format_rows(rows: list[dict]) -> str:
    """Column-aligned text table for a small list of row dicts (CLI
    display only — rows is already head-bounded by take())."""
    if not rows:
        return "(empty)"
    cols = list(rows[0].keys())
    cells = [[_cell(r.get(c)) for c in cols] for r in rows]
    widths = [
        max(len(c), max(len(row[i]) for row in cells)) for i, c in enumerate(cols)
    ]
    out = [" ".join(c.rjust(w) for c, w in zip(cols, widths))]
    for row in cells:
        out.append(" ".join(v.rjust(w) for v, w in zip(row, widths)))
    return "\n".join(out)


def _cell(v) -> str:
    s = str(v.tolist() if hasattr(v, "tolist") else v)
    return s if len(s) <= 60 else s[:57] + "..."


def _run_query(svc, presenter, query: str, k: int, as_json: bool) -> None:
    """One query → top-k results, mirroring the reference UI's display
    path (start_search_engine.py:117-167 display_results/main): per result
    the title, url and M16 context window, plus the elapsed-time line.
    Serving is single-process like the reference — no Ray session needed."""
    import time

    from .functions.text import query_tokens

    start = time.time()
    rows = svc.search(query, k=k)
    elapsed = round(time.time() - start, 6)
    primary, _ = query_tokens(query)
    ctx = presenter.contexts([r[2] for r in rows], primary) if presenter else {}
    if as_json:
        for doc_id, score, url, title in rows:
            rec = {"doc_id": doc_id, "score": score, "url": url, "title": title}
            if presenter:
                rec["context"] = ctx.get(url, "")
            print(json.dumps(rec))
    else:
        print(f"Search completed in {elapsed} seconds.")
        for doc_id, score, url, title in rows:
            print(f"\n## {title}")
            print(url)
            if presenter:
                print(ctx.get(url, ""))
            print("---")


def cmd_search(args) -> int:
    from .pipelines.search import ResultPresenter, SearchService

    svc = SearchService(
        os.path.join(args.index, "postings"), os.path.join(args.index, "catalog")
    )
    presenter = ResultPresenter(args.pages) if args.pages else None
    if args.query:
        _run_query(svc, presenter, args.query, args.k, as_json=not args.repl)
        return 0
    # REPL: the terminal stand-in for the reference's Streamlit query loop
    while True:
        try:
            query = input("Enter a query: ").strip()
        except (EOFError, KeyboardInterrupt):
            print()
            return 0
        if not query or query in (":q", "exit", "quit"):
            return 0
        _run_query(svc, presenter, query, args.k, as_json=False)


def _serve_answer(svc, presenter, query: str, k: int, summary_mode: str) -> dict:
    """One warm query → the serve-surface record {query, elapsed_ms,
    results: [{doc_id, score, url, title, context?, summary?}]} — shared
    by the stdin JSON-lines loop and the HTTP endpoint."""
    import time

    from .functions.text import query_tokens

    start = time.perf_counter()
    rows = svc.search(query, k=k)
    elapsed_ms = (time.perf_counter() - start) * 1000.0
    ctx = {}
    primary = ()
    if presenter:
        primary, _ = query_tokens(query)
        ctx = presenter.contexts([r[2] for r in rows], primary)
    results = []
    for doc_id, score, url, title in rows:
        rec = {"doc_id": doc_id, "score": score, "url": url, "title": title}
        if presenter:
            rec["context"] = ctx.get(url, "")
            if summary_mode == "extractive":
                rec["summary"] = presenter.summary_extractive(url, primary)
        results.append(rec)
    return {"query": query, "elapsed_ms": round(elapsed_ms, 3), "results": results}


_SERVE_HTML = """<!doctype html>
<title>web_crawler_search_engine_ray</title>
<style>body{font-family:sans-serif;max-width:48em;margin:2em auto}
.r{margin:1em 0}.t{font-weight:bold}.u{color:#070}.c{color:#444}
.s{color:#226;font-style:italic}</style>
<h2>Search</h2>
<form onsubmit="go();return false"><input id=q size=40 autofocus>
<button>Search</button></form><div id=meta></div><div id=out></div>
<script>
async function go(){
  const q=document.getElementById('q').value;
  const r=await fetch('/search?q='+encodeURIComponent(q));
  const d=await r.json();
  document.getElementById('meta').textContent=
    'Search completed in '+(d.elapsed_ms/1000).toFixed(3)+' seconds';
  document.getElementById('out').innerHTML=d.results.map(x=>
    '<div class=r><div class=t></div><div class=u></div>'+
    '<div class=c></div><div class=s></div></div>').join('');
  document.querySelectorAll('.r').forEach((el,i)=>{
    const x=d.results[i];
    el.querySelector('.t').textContent=x.title||x.url;
    el.querySelector('.u').textContent=x.url;
    el.querySelector('.c').textContent=x.context||'';
    el.querySelector('.s').textContent=x.summary?('AI Summary: '+x.summary):'';
  });
}
</script>"""


def make_http_server(
    svc, presenter, port: int, k: int, summary_mode: str, host: str = "127.0.0.1"
):
    """stdlib ThreadingHTTPServer serving the reference's browser surface
    (start_search_engine.py:117-167 shape: per-result title/url/context +
    optional summary): GET / → minimal search page, GET /search?q=&k= →
    the same JSON record as the stdin serve loop. port=0 binds an
    ephemeral port (tests); binds loopback unless ``host`` overrides.
    No dependency beyond the stdlib."""
    import urllib.parse
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 (stdlib API name)
            u = urllib.parse.urlparse(self.path)
            if u.path == "/search":
                qs = urllib.parse.parse_qs(u.query)
                query = (qs.get("q") or [""])[0].strip()
                try:
                    kk = int((qs.get("k") or [k])[0])
                except ValueError:
                    kk = 0
                if kk < 1:  # bad/absurd k -> 400, not a dropped connection
                    body = json.dumps({"error": "k must be a positive int"})
                    self.send_response(400)
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body.encode())
                    return
                body = json.dumps(
                    _serve_answer(svc, presenter, query, kk, summary_mode)
                ).encode()
                ctype = "application/json"
            elif u.path == "/":
                body = _SERVE_HTML.encode()
                ctype = "text/html; charset=utf-8"
            else:
                self.send_response(404)
                self.end_headers()
                return
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet: one JSON ready-line is the log
            pass

    return ThreadingHTTPServer((host, port), Handler)


def cmd_serve(args) -> int:
    """Warm query service against a prebuilt index (the reference's
    Streamlit surface, start_search_engine.py:117-167): the index loads
    ONCE, then each query is answered from the in-memory postings lookup
    (<100 ms warm; test_cli.py pins it). Two transports, same record:
    stdin line → JSON line (default), or --http PORT → a stdlib HTTP
    server with a minimal browser page at / and JSON at /search?q=.
    Single-process like the reference's serving path — no Ray session."""
    from .pipelines.search import ResultPresenter, SearchService

    svc = SearchService(
        os.path.join(args.index, "postings"), os.path.join(args.index, "catalog")
    )
    presenter = ResultPresenter(args.pages) if args.pages else None
    svc.search(args.warmup, k=1)  # touch the postings store once
    if args.http is not None:
        srv = make_http_server(
            svc, presenter, args.http, args.k, args.summary, host=args.host
        )
        print(
            json.dumps(
                {"ready": True, "index": args.index, "http": srv.server_address[1]}
            ),
            flush=True,
        )
        try:
            srv.serve_forever()
        except KeyboardInterrupt:
            pass
        finally:
            srv.server_close()
        return 0
    print(json.dumps({"ready": True, "index": args.index}), flush=True)
    for line in sys.stdin:
        query = line.strip()
        if not query or query in (":q", "exit", "quit"):
            break
        print(
            json.dumps(_serve_answer(svc, presenter, query, args.k, args.summary)),
            flush=True,
        )
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="web_crawler_search_engine_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("genweb", help="generate a deterministic synthetic web")
    g.add_argument("--out", required=True)
    g.add_argument("--seed", type=int, default=42)
    g.add_argument("--hosts", type=int, default=8)
    g.add_argument("--docs", type=int, default=1000)
    g.add_argument("--extra-links", type=int, default=0)
    g.add_argument("--words-scale", type=int, default=1)
    g.set_defaults(fn=cmd_genweb)

    c = sub.add_parser("crawl", help="run the frontier crawl to exhaustion")
    c.add_argument(
        "--web-dir",
        default=None,
        help="dir with docs/robots/seeds parquet (required for --transport store)",
    )
    c.add_argument("--workdir", required=True)
    c.add_argument("--seeds", default=None, help="comma-separated override")
    c.add_argument("--wave-span", type=float, default=8.0)
    c.add_argument("--politeness", type=float, default=0.5)
    c.add_argument(
        "--transport",
        choices=("store", "http"),
        default="store",
        help="fetch transport: synthetic-store join (default) or real "
        "network via requests (stages/http_fetch.py)",
    )
    c.add_argument("--root-domains", default=None, help="comma-separated crawl scope")
    c.add_argument("--http-timeout", type=float, default=5.0)
    c.add_argument("--resume", action="store_true")
    c.set_defaults(fn=cmd_crawl)

    i = sub.add_parser("index", help="build the inverted index from crawled pages")
    i.add_argument("--pages", required=True)
    i.add_argument("--out", required=True)
    i.add_argument("--min-ngram-df", type=int, default=10)
    i.set_defaults(fn=cmd_index)

    s = sub.add_parser("search", help="query the index (one-shot or REPL)")
    s.add_argument("--index", required=True, help="index dir (postings/ + catalog/)")
    s.add_argument("--pages", default=None, help="pages dir for context windows")
    s.add_argument("--query", default=None, help="one-shot query; omit for a REPL")
    s.add_argument("--repl", action="store_true", help="human-readable output")
    s.add_argument("-k", type=int, default=5)
    s.set_defaults(fn=cmd_search)

    v = sub.add_parser("serve", help="warm stdin→JSON-lines query service")
    v.add_argument("--index", required=True, help="index dir (postings/ + catalog/)")
    v.add_argument("--pages", default=None, help="pages dir for context windows")
    v.add_argument("--warmup", default="the", help="warm-up query run at startup")
    v.add_argument(
        "--summary",
        choices=["none", "extractive"],
        default="none",
        help="per-result summary: 'extractive' = offline deterministic "
        "lead extract (the LLM path is an injected client on "
        "ResultPresenter.summary, '' without one — reference no-key parity)",
    )
    v.add_argument("-k", type=int, default=5)
    v.add_argument(
        "--http",
        type=int,
        default=None,
        metavar="PORT",
        help="serve over HTTP instead of stdin: GET / is a minimal search "
        "page, GET /search?q=&k= returns the JSON record (0 = ephemeral); "
        "binds loopback only unless --host overrides",
    )
    v.add_argument(
        "--host",
        default="127.0.0.1",
        help="HTTP bind address (default loopback; 0.0.0.0 to expose)",
    )
    v.set_defaults(fn=cmd_serve)

    q = sub.add_parser(
        "query", help="run a registered pipeline operator over an sf-table dir"
    )
    q.add_argument("name", nargs="?", default=None, help="query name (see --list)")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    q.add_argument("--out", default=None, help="write result parquet here")
    q.add_argument("--head", type=int, default=20, help="rows to print without --out")
    q.add_argument("--list", action="store_true", help="list registered queries")
    q.set_defaults(fn=cmd_query)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
