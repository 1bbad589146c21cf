"""Reference-faithful single-threaded crawl simulator — the parity oracle.

Direct transcription of the spiders' queue rules over the synthetic site
graph (NOT over HTML — the Spark engine must *re-discover* the same links by
parsing, which is what makes the comparison meaningful):

- 2-level dequeue post > page, FIFO within level:
  ``Crawl_Data_FaceBook/spiders/Facebook_group_post.py:77-92``
- 4-level dequeue reaction > comment > post > page:
  ``spiders/Facebook_group_reaction.py:111-133``
- seeding page_urls from GROUP_IDS in list order:
  ``Facebook_group_post.py:96-103``; discovery appends posts in DOM order then
  the next-page link (``:152-161``)
- dedup before enqueue (the Mongo exist-check ``:143`` + Scrapy dupefilter
  ``settings.py:37``, folded into one canonical-URL-seen rule; see SURVEY §2.3
  J1-J3 — enqueue-time dedup gives the same fetch order without the
  dupefilter's chain-stall pathology).

Outputs: total fetch order (list of canonical URLs) and the final URL-seen
set — the two artifacts the north rule requires the Spark engine to match.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from facebook_page_scrapy_spark.datagen import Site, comment_url, page_url


@dataclass
class SimResult:
    fetch_order: list[str]
    seen: set[str]
    failed: list[str] = field(default_factory=list)


def simulate(
    site: Site, max_fetches: int | None = None, reset_at: int | None = None
) -> SimResult:
    """``reset_at=k`` replays U3: after k fetches the spider restarts and the
    restore path drops the reaction/comment queues
    (Facebook_group_reaction.py:91-93) — their URLs stay in the seen set, so
    they are never re-enqueued (enqueue only happens at post parse)."""
    four = site.four_level
    page_q: list[str] = []
    post_q: list[str] = []
    cmt_q: list[str] = []
    rxn_q: list[str] = []

    seen: set[str] = set()
    fetch_order: list[str] = []
    failed: list[str] = []

    def enqueue(q: list[str], url: str) -> None:
        if url in seen:
            return
        seen.add(url)
        q.append(url)

    for gid in site.seeds:
        enqueue(page_q, page_url(gid, 0))

    while max_fetches is None or len(fetch_order) < max_fetches:
        if reset_at is not None and len(fetch_order) == reset_at:
            rxn_q, cmt_q = queue_reset_on_resume(rxn_q, cmt_q)
            reset_at = None
        # strict priority dequeue (reaction > comment > post > page)
        if four and rxn_q:
            url = rxn_q.pop(0)
        elif four and cmt_q:
            url = cmt_q.pop(0)
        elif post_q:
            url = post_q.pop(0)
        elif page_q:
            url = page_q.pop(0)
        else:
            break

        node = site.nodes.get(url)
        if node is None:
            failed.append(url)
            continue
        fetch_order.append(url)

        if node.kind == "page":
            # DOM order: posts first, then next-page (Facebook_group_post.py:152-161)
            for link in node.out_links:
                target = site.nodes.get(link)
                if target is not None and target.kind == "post":
                    enqueue(post_q, link)
                else:
                    enqueue(page_q, link)
        elif node.kind == "post" and four:
            # reaction link then comment link (get_html_post order,
            # Facebook_group_reaction.py:188-205)
            for link in node.out_links:
                target_kind = site.nodes[link].kind if link in site.nodes else "comment"
                if target_kind == "reaction":
                    enqueue(rxn_q, link)
                else:
                    enqueue(cmt_q, link)
        elif node.kind == "comment":
            # any comments parsed → p+10 (Facebook_group_cmt.py:176-178)
            for link in node.out_links:
                enqueue(cmt_q, link)
        # post (2-level) and reaction pages are terminal

    return SimResult(fetch_order=fetch_order, seen=seen, failed=failed)


def queue_reset_on_resume(rxn_q: list, cmt_q: list) -> tuple[list, list]:
    """U3: the reaction spider drops reaction/comment queues at restore
    (Facebook_group_reaction.py:91-93)."""
    return [], []
