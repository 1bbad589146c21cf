"""HTML file-tree source: P11 extension filter + path-derived ids.

Mirrors Parse_Data_FaceBook/parsing.py:20-47 (extract_post_dirs walks
<group>/posts/<post>/, get_htmls keeps only *.html) as a distributed
binaryFile read with the glob pushed into the file index.
"""

import os

from facebook_page_scrapy_spark.sources.htmltree import read_html_tree


def test_html_tree_filters_and_ids(spark, tmp_path):
    base = tmp_path / "g123" / "posts" / "p777"
    os.makedirs(base)
    (base / "post.html").write_text("<html>post body</html>", encoding="utf8")
    (base / "cmt_0.html").write_text("<html>cmt page</html>", encoding="utf8")
    (base / "notes.txt").write_text("not html", encoding="utf8")  # P11: excluded
    other = tmp_path / "g456" / "posts" / "p888"
    os.makedirs(other)
    (other / "post.html").write_text("<html>second</html>", encoding="utf8")

    rows = read_html_tree(spark, str(tmp_path)).collect()
    by_name = {(r.group_id, r.post_id, r.file_name): r.html for r in rows}
    assert len(rows) == 3  # the .txt never appears
    assert by_name[("g123", "p777", "post.html")] == "<html>post body</html>"
    assert by_name[("g123", "p777", "cmt_0.html")] == "<html>cmt page</html>"
    assert by_name[("g456", "p888", "post.html")] == "<html>second</html>"
