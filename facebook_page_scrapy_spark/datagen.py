"""Deterministic synthetic crawl world + corpora (no wall-clock, no network).

Renders mbasic-shaped HTML that the reference's XPaths (and our stdlib
extractor) parse: group pages with ``#m_group_stories_container`` post divs
carrying ``data-ft`` JSON and permalink anchors
(``Facebook_group_post.py:131-161``), post permalink pages with
``#m_story_permalink_view`` (``Parser.py:121-154``) whose content interleaves
text divs and ``<img>`` media in DOM order (the span invariant), inline
comments (``Parser.py:156-185``) and reaction bars (``Parser.py:187-194``).

The same generator yields the closed-world site graph rows used by the
reference-faithful simulator, so engine-vs-simulator parity tests compare
*parsed rediscovery* (Spark side) against *declared out_links* (oracle side).
"""

from __future__ import annotations

import hashlib
import html as html_lib
import json
import random
from dataclasses import dataclass, field

WORDS = (
    "tin nong hom nay chia se cong dong nhom ban tin video anh bai viet "
    "binh luan cam xuc trang chu xem them noi dung cap nhat moi nhat"
).split()

EMOTES = ["Thích", "Yêu thích", "Haha", "Wow", "Buồn", "Phẫn nộ", "Thương thương"]


def _rng_for(*key) -> random.Random:
    seed = int.from_bytes(
        hashlib.blake2b("|".join(map(str, key)).encode(), digest_size=8).digest(), "little"
    )
    return random.Random(seed)


def _data_ft_attr(d: dict) -> str:
    return html_lib.escape(json.dumps(d, separators=(",", ":")), quote=True)


def page_url(group_id: str, page_idx: int) -> str:
    if page_idx == 0:
        return f"https://mbasic.facebook.com/groups/{group_id}"
    return f"https://mbasic.facebook.com/groups/{group_id}?bacr=page{page_idx}&refid=18"


def post_url(group_id: str, post_id: str) -> str:
    return f"https://mbasic.facebook.com/groups/{group_id}/permalink/{post_id}/?refid=18"


def comment_url(group_id: str, post_id: str, offset: int) -> str:
    return f"https://mbasic.facebook.com/groups/{group_id}/posts/{post_id}/?p={offset}"


def reaction_url(post_id: str) -> str:
    return f"https://mbasic.facebook.com/ufi/reaction/?ft_ent_identifier={post_id}"


@dataclass
class SiteNode:
    url: str
    kind: str  # page|post|comment|reaction
    group_id: str
    post_id: str | None
    html: str
    out_links: list[str]  # DOM discovery order
    doc_id: str
    spans: list[dict] = field(default_factory=list)  # intended spans (posts)
    fp_posts: list[dict] = field(default_factory=list)  # intended fan-page posts


@dataclass
class Site:
    nodes: dict[str, SiteNode]  # keyed by canonical URL
    seeds: list[str]  # group ids
    four_level: bool


def _post_body(group_id: str, post_id: str, rng: random.Random) -> tuple[str, list[dict]]:
    """Interleaved text/media content + intended span records."""
    n_spans = rng.randint(1, 6)
    parts, spans = [], []
    for i in range(n_spans):
        if rng.random() < 0.35:
            ref = f"https://cdn.example/{group_id}_{post_id}_{i}.jpg"
            parts.append(f'<img src="{ref}" />')
            spans.append({"kind": "media", "text": "", "media_ref": ref, "offset": i})
        else:
            words = " ".join(rng.choices(WORDS, k=rng.randint(3, 12)))
            parts.append(f"<div><p>{words}</p></div>")
            spans.append({"kind": "text", "text": words, "media_ref": "", "offset": i})
    return "".join(parts), spans


def _comments_html(group_id: str, post_id: str, offset: int, n: int, rng: random.Random) -> str:
    divs = []
    for j in range(n):
        cid = f"c{post_id}_{offset + j}"
        name = f"user {rng.randint(1, 99)}"
        uid = rng.randint(10**8, 10**9)
        text = " ".join(rng.choices(WORDS, k=rng.randint(2, 8)))
        divs.append(
            f'<div id="{cid}"><div>'
            f'<h3><a href="/profile.php?id={uid}&amp;refid=18">{name}</a></h3>'
            f"<div>{text}</div><div>meta</div>"
            f'<div><a href="/comment/replies/?ctoken={cid}">replies</a></div>'
            f"</div></div>"
        )
    return "".join(divs)


def render_post_html(
    group_id: str,
    post_id: str,
    publish_time: int,
    body_html: str,
    comments_html: str,
) -> str:
    uid = int(hashlib.blake2b(post_id.encode(), digest_size=4).hexdigest(), 16)
    data_ft = {
        "top_level_post_id": post_id,
        "page_id": group_id,
        "page_insights": {group_id: {"post_context": {"publish_time": publish_time}}},
    }
    return (
        "<html><body>"
        '<div id="m_story_permalink_view">'
        "<div>"
        f'<div data-ft="{_data_ft_attr(data_ft)}">'
        "<div>"
        f'<div><h3><span><strong><a href="/profile.php?id={uid}&amp;refid=18">'
        f"Author {uid % 100}</a></strong></span></h3></div>"
        f"{body_html}"
        "</div></div></div>"
        "<div><div>"
        "<div>bar1</div><div>bar2</div><div>bar3</div>"
        f"<div>{comments_html}</div>"
        "</div></div>"
        "</div></body></html>"
    )


def render_page_html(group_id: str, post_ids: list[str], next_href: str | None) -> str:
    post_divs = []
    for pid in post_ids:
        href = post_url(group_id, pid)
        post_divs.append(
            f'<div data-ft="{_data_ft_attr({"top_level_post_id": pid})}">'
            "<div><h3>hdr</h3></div>"
            "<div><div>meta</div>"
            f'<div><a href="https://offsite.example/{pid}">offsite</a>'
            f'<a href="{href}&amp;fbclid=TRACK{pid}">permalink</a></div>'
            "</div></div>"
        )
    nxt = f'<div><a href="{next_href}">Xem thêm</a></div>' if next_href else "<div></div>"
    return (
        "<html><body>"
        '<div id="m_group_stories_container">'
        f'<div>{"".join(post_divs)}</div>'
        f"{nxt}"
        "</div></body></html>"
    )


def render_reaction_html(reactions: dict[str, int]) -> str:
    anchors = "".join(
        f'<a><img alt="{k}" src="/e.png" /><span>{v}</span></a>' for k, v in reactions.items()
    )
    return (
        "<html><body>"
        f'<div id="root"><table><tbody><tr><td><div><div>{anchors}</div></div>'
        "</td></tr></tbody></table></div></body></html>"
    )


def fanpage_url(page_id: str) -> str:
    """Fan-page homepage URL (Facebook_page.py:24-29: the page spider fetches
    ``https://mbasic.facebook.com/<page_id>`` — NOT a /groups/ path)."""
    return f"https://mbasic.facebook.com/{page_id}"


def render_fanpage_html(page_id: str, posts: list[dict]) -> str:
    """Fan-page homepage timeline in the shape Facebook_page.py's (documented)
    XPaths expect: post containers with class ``_55wo _5rgr _5gh8 async_like
    _1tl-`` (:46), ``data-ft`` carrying ``mf_story_key``/``page_id`` (:51-53),
    a header abbr date (:73), exposed/background text spans including the
    "Xem thêm" placeholder the text join must drop (:84-85), and a footer
    with react/comment/share counts (:61-68)."""
    divs = []
    for p in posts:
        data_ft = {"mf_story_key": p["post_id"], "page_id": page_id}
        exposed = "".join(f"<span>{t}</span>" for t in p["exposed"])
        background = "".join(f"<span>{t}</span>" for t in ["pad"] + [p["background"]])
        divs.append(
            f'<div class="_55wo _5rgr _5gh8 async_like _1tl-" data-ft="{_data_ft_attr(data_ft)}">'
            "<div>"  # body
            "<header><div>hdr</div>"
            f'<div><div><div><div><div><a href="#"><abbr>{p["date"]}</abbr></a></div></div>'
            "</div></div></div></header>"
            f"<div><div>{exposed}<div>{background}</div></div></div>"  # content = body div/div
            "</div>"
            "<footer><div><div><a>"
            f'<div><div><div>{p["n_reacts"]}</div></div>'
            f'<div><span>{p["n_comments"]}</span><span>{p["n_shares"]}</span></div></div>'
            "</a></div></div></footer>"
            "</div>"
        )
    return (
        "<html><body>"
        f'<div id="fanpage_timeline">{"".join(divs)}</div>'
        "</body></html>"
    )


def make_fanpage_site(n_pages: int = 3, posts_per_page: int = 3, seed: int = 42) -> Site:
    """Closed fan-page world: one terminal homepage per page id
    (Facebook_page.py yields a single Request per page, saves the homepage,
    and parses the timeline — no link discovery)."""
    nodes: dict[str, SiteNode] = {}
    seeds = [f"fanpage{seed}{i:02d}" for i in range(n_pages)]
    for pid_page in seeds:
        rng = _rng_for(seed, "fanpage", pid_page)
        posts = []
        for j in range(posts_per_page):
            story = str(rng.randint(10**14, 10**15))
            exposed = [
                " ".join(rng.choices(WORDS, k=rng.randint(3, 8))),
                "Xem thêm",  # the placeholder P7 must drop
                " ".join(rng.choices(WORDS, k=rng.randint(2, 5))),
            ]
            posts.append({
                "post_id": story,
                "exposed": exposed,
                "background": " ".join(rng.choices(WORDS, k=rng.randint(2, 6))),
                "date": f"{rng.randint(1, 23)} giờ",
                "n_reacts": str(rng.randint(0, 900)),
                "n_comments": f"{rng.randint(0, 50)} bình luận",
                "n_shares": f"{rng.randint(0, 20)} lần chia sẻ",
            })
        url = fanpage_url(pid_page)
        nodes[url] = SiteNode(
            url, "page", pid_page, None,
            render_fanpage_html(pid_page, posts), [], f"fanpage:{pid_page}",
            fp_posts=posts,
        )
    return Site(nodes=nodes, seeds=seeds, four_level=False)


def make_site(
    n_groups: int = 3,
    pages_per_group: int = 3,
    posts_per_page: int = 2,
    comments_per_post: int = 0,
    comment_page_size: int = 10,
    four_level: bool = False,
    seed: int = 42,
    skew_group: int | None = None,
    skew_factor: int = 1,
) -> Site:
    """Closed synthetic crawl world. ``skew_group``/``skew_factor`` make one
    group hold ``skew_factor×`` the pages (hot-host analog for skew tests).
    In ``four_level`` mode each post page links a reaction page and (when it
    has comments) a ``?p=0`` comment page; comment pages chain ``?p+=10``
    while full (Facebook_group_cmt.py:176-178 semantics, bug fixed)."""
    nodes: dict[str, SiteNode] = {}
    seeds = [f"g{seed}{i:03d}" for i in range(n_groups)]

    for gi, gid in enumerate(seeds):
        n_pages = pages_per_group * (skew_factor if gi == skew_group else 1)
        for pi in range(n_pages):
            pids = [str((gi + 1) * 10**9 + pi * 10**3 + j) for j in range(posts_per_page)]
            next_href = None
            if pi + 1 < n_pages:
                nxt = page_url(gid, pi + 1)
                next_href = nxt.replace("https://mbasic.facebook.com", "")
            html = render_page_html(gid, pids, next_href)
            out = [post_url(gid, p) for p in pids] + (
                [page_url(gid, pi + 1)] if next_href else []
            )
            url = page_url(gid, pi)
            nodes[url] = SiteNode(url, "page", gid, None, html, out, f"page:{gid}:{pi}")

            for pid in pids:
                rng = _rng_for(seed, gid, pid)
                publish_time = 1650000000 + rng.randint(0, 10**6)
                body, spans = _post_body(gid, pid, rng)
                n_cmts = comments_per_post and rng.randint(0, comments_per_post)
                inline = _comments_html(gid, pid, 0, min(n_cmts, comment_page_size), rng)
                phtml = render_post_html(gid, pid, publish_time, body, inline)
                purl = post_url(gid, pid)
                out_links: list[str] = []
                if four_level:
                    out_links.append(reaction_url(pid))
                    if n_cmts:
                        out_links.append(comment_url(gid, pid, 0))
                nodes[purl] = SiteNode(purl, "post", gid, pid, phtml, out_links, f"post:{pid}", spans)

                if four_level:
                    rxn = {k: rng.randint(0, 500) for k in rng.sample(EMOTES, rng.randint(1, 4))}
                    rurl = reaction_url(pid)
                    nodes[rurl] = SiteNode(
                        rurl, "reaction", gid, pid, render_reaction_html(rxn), [], f"rxn:{pid}"
                    )
                    # Comment pages at p=0,10,... The reference enqueues p+10
                    # whenever a page parsed ≥1 comment (Facebook_group_cmt.py
                    # :176-178), so every non-empty page links its successor
                    # and the chain ends on one empty trailing page.
                    off = 0
                    while n_cmts:  # exits via the empty trailing page
                        n_here = max(0, min(comment_page_size, n_cmts - off))
                        chtml = render_post_html(
                            gid, pid, publish_time, "",
                            _comments_html(gid, pid, off, n_here, rng),
                        )
                        curl = comment_url(gid, pid, off)
                        nxt_links = (
                            [comment_url(gid, pid, off + comment_page_size)]
                            if n_here > 0
                            else []
                        )
                        nodes[curl] = SiteNode(
                            curl, "comment", gid, pid, chtml, nxt_links, f"cmt:{pid}:{off}"
                        )
                        if n_here == 0:
                            break
                        off += comment_page_size

    return Site(nodes=nodes, seeds=seeds, four_level=four_level)


def site_to_dataframes(spark, site: Site):
    """(site_graph_df, raw_corpus_df) — raw_corpus is the fetchable world."""
    from facebook_page_scrapy_spark import schemas

    graph_rows = [
        (n.url, n.kind, n.out_links, n.doc_id) for n in site.nodes.values()
    ]
    corpus_rows = [(n.doc_id, n.url, 0, n.html) for n in site.nodes.values()]
    graph = spark.createDataFrame(graph_rows, schemas.SITE_GRAPH)
    corpus = spark.createDataFrame(corpus_rows, schemas.RAW_PAGES)
    return graph, corpus


def spans_corpus(spark, site: Site):
    """Intended interleaved-span documents table (input_hint shape) for the
    posts in the site — ground truth for span-sequence equality."""
    from facebook_page_scrapy_spark import schemas

    rows = []
    for n in site.nodes.values():
        if n.kind == "post" and n.spans:
            rows.append(
                (n.doc_id, [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in n.spans])
            )
    return spark.createDataFrame(rows, schemas.DOCUMENTS)
