"""Stylesheet injected into transcoded output.

The reference embeds an 82-line ``readability.css`` resource
(``NReadabilityTranscoder.cs:707-736``). Tests only assert that exactly
one ``<style>`` element is injected — the stylesheet body is ours
(written fresh; not copied from the reference resource).
"""

READABILITY_CSS = """
body { margin: 0; padding: 0; }
#readOverlay { background: #f8f6f1; min-height: 100%; }
#readInner { margin: 0 auto; line-height: 1.5; }
#readInner h1 { font-size: 1.6em; line-height: 1.2; }
#readInner p { margin: 0 0 1em 0; }
.style-newspaper #readInner { font-family: Georgia, serif; }
.style-novel #readInner { font-family: Palatino, serif; }
.style-ebook #readInner { font-family: Helvetica, sans-serif; }
.style-terminal #readInner { font-family: monospace; }
.margin-x-narrow #readInner { width: 95%; }
.margin-narrow #readInner { width: 85%; }
.margin-medium #readInner { width: 75%; }
.margin-wide #readInner { width: 65%; }
.margin-x-wide #readInner { width: 55%; }
.size-x-small #readInner { font-size: 0.8em; }
.size-small #readInner { font-size: 0.9em; }
.size-medium #readInner { font-size: 1.0em; }
.size-large #readInner { font-size: 1.2em; }
.size-x-large #readInner { font-size: 1.4em; }
.readability-styled { display: inline; }
""".strip()
