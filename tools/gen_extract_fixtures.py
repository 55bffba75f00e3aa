"""Write the HTML->text golden fixtures (FIXTURES.md §3) ONCE.

Run manually: python tools/gen_extract_fixtures.py
Re-running refuses to overwrite existing .txt files — the byte-identity
invariant (BASELINE.json:15) means fixtures are frozen forever; delete
a pair explicitly only with a conscious decision to break compat.
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
from engine.kernels import extract_text  # noqa: E402

FIX = pathlib.Path(__file__).resolve().parents[1] / "tests" / "fixtures" / "extract"

CASES: dict[str, bytes] = {
    "plain_paragraphs": b"<html><body><p>First paragraph.</p><p>Second one,\n  wrapped\n  lines.</p></body></html>",
    "nested_blocks": b"<div><section><h1>Title</h1><div><p>inner <b>bold</b> and <i>italic</i> text</p></div></section><footer>foot</footer></div>",
    "script_style_stripped": b"<html><head><title>T</title><style>p{color:red}</style><script>var x=1;</script></head><body><p>visible</p><noscript>hidden</noscript><template>tpl</template>done</body></html>",
    "entities": b"<p>Fish &amp; chips cost &#x20AC;5 &lt;really&gt; &quot;cheap&quot; &nbsp; ok</p>",
    "whitespace_collapse": b"<p>a    b\t\tc\n\n\nd</p><p>  e  </p>",
    "br_li": b"<p>line1<br>line2<br/>line3</p><ul><li>one<li>two</li><li>three</li></ul>",
    "non_ascii": "<p>Straße über Größe</p><p>中文文本测试</p><p>café — résumé</p>".encode("utf-8"),
    "malformed": b"<html><body><p>unclosed <div>mixed </p>oops<b>bold<p>next",
    "empty_body": b"<html><head><title></title></head><body></body></html>",
    "tables": b"<table><tr><th>h1</th><th>h2</th></tr><tr><td>a</td><td>b</td></tr></table>",
    "inline_only": b"hello <b>world</b> <span>and</span> <em>more</em>",
    "invalid_utf8": b"<p>ok \xff\xfe bad</p>",
    "nbsp_entity": b"<p>a&nbsp;b</p>",
    "links_imgs": b'<p>see <a href="/x">the link</a> and <img src="/i.png" alt="alt ignored"></p>',
    "pre_block": b"<pre>  spaced\n  code</pre><p>after</p>",
}
# block-split safety: > 1 MB html
CASES["huge"] = b"<html><body>" + b"".join(
    b"<p>paragraph %d with some repeated filler text to grow the file</p>" % i
    for i in range(20000)
) + b"</body></html>"


def main() -> None:
    FIX.mkdir(parents=True, exist_ok=True)
    wrote = skipped = 0
    for name, html in CASES.items():
        h = FIX / f"{name}.html"
        t = FIX / f"{name}.txt"
        if t.exists():
            skipped += 1
            continue
        h.write_bytes(html)
        t.write_bytes(extract_text(html).encode("utf-8"))
        wrote += 1
    print(f"wrote {wrote}, kept frozen {skipped} at {FIX}")


if __name__ == "__main__":
    main()
