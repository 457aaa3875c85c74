"""ExtractorHTML law — the reference's own test battery re-expressed.

Golden sources:
- ExtractorHTMLTest.VALID_TEST_DATA (ExtractorHTMLTest.java:39-69)
- testNoWhitespaceBeforeValidAttribute (HER-1128, :142-146)
- testOnlyExtractFormGets (HER-1280, :177-190)
- testMetaRobots (:195-209)
- testBadRelativeLinks (HER-1268, :219-243)
- testSpeculativeLinkExtraction (HER-1524, :251-276)
- testScriptTagWritingScriptType (HER-1526, :288-302)
- testOutLinksWithBaseHref (:304-323)
- testFlashvarsParamValue / testFlashvarsEmbedAttribute (HER-1728,
  :345-381)

Link destinations compare after UURI normalization (fixup_py), the
same normalization UURIFactory applies to both sides in the Java
asserts.
"""

from __future__ import annotations

import pytest

from heritrix_spark.functions.fixup import fixup_py
from heritrix_spark.operators.html_extract import (
    extract_html_py,
    is_html_expected_here,
)

ARCHIVE_START = "http://www.archive.org/start/"
EXAMPLE = "http://www.example.com"


def links_of(page, content, **kw):
    links, _, _ = extract_html_py(page, content, **kw)
    return links


def dests(page, content, **kw):
    return [u for u, _, _ in links_of(page, content, **kw)]


# ExtractorHTMLTest.VALID_TEST_DATA: (content, expected dest, context, hop)
VALID_TEST_DATA = [
    ('<a href="http://www.slashdot.org">yellow journalism</a> A',
     "http://www.slashdot.org", "a/@href", "L"),
    ("<a href='http://www.slashdot.org'>yellow journalism</a> A",
     "http://www.slashdot.org", "a/@href", "L"),
    ("<a href=http://www.slashdot.org>yellow journalism</a> A",
     "http://www.slashdot.org", "a/@href", "L"),
    ('<a href="http://www.slashdot.org">yellow journalism A',
     "http://www.slashdot.org", "a/@href", "L"),
    ("<a href='http://www.slashdot.org'>yellow journalism A",
     "http://www.slashdot.org", "a/@href", "L"),
    ("<a href=http://www.slashdot.org>yellow journalism A",
     "http://www.slashdot.org", "a/@href", "L"),
    ('<a href="http://www.slashdot.org"/>yellow journalism A',
     "http://www.slashdot.org", "a/@href", "L"),
    ("<a href='http://www.slashdot.org'/>yellow journalism A",
     "http://www.slashdot.org", "a/@href", "L"),
    ("<a href=http://www.slashdot.org/>yellow journalism A",
     "http://www.slashdot.org", "a/@href", "L"),
    ('<img src="foo.gif"> IMG',
     "http://www.archive.org/start/foo.gif", "img/@src", "E"),
]


@pytest.mark.parametrize("content,dest,context,hop", VALID_TEST_DATA)
def test_valid_test_data(content, dest, context, hop):
    links = links_of(ARCHIVE_START, content)
    assert len(links) == 1
    uri, ctx, h = links[0]
    assert uri == fixup_py(dest)
    assert ctx == context
    assert h == hop


def test_no_whitespace_before_valid_attribute():
    # HER-1128: no whitespace between a quoted value and the next attr
    links = links_of(
        EXAMPLE, '<frame name="main"src="http://expected.example.com/"> ')
    assert [u for u, _, _ in links] == ["http://expected.example.com/"]


def test_only_extract_form_gets():
    # HER-1280: POST action dropped, explicit/implied GET kept
    cs = (
        '<form method="get" action="http://www.example.com/ok1"> '
        '<form action="http://www.example.com/ok2" method="get"> '
        '<form method="post" action="http://www.example.com/notok"> '
        '<form action="http://www.example.com/ok3"> ')
    assert len(links_of(EXAMPLE, cs)) == 3
    # with extractOnlyFormGets off, the POST action is extracted too
    assert len(links_of(EXAMPLE, cs, extract_only_form_gets=False)) == 4
    # ignoreFormActionUrls drops all
    assert links_of(EXAMPLE, cs, ignore_form_action_urls=True) == []


def test_meta_robots():
    cs = ("Blah Blah "
          "<meta name='robots' content='index,nofollow'>"
          "<a href='blahblah'>blah</a> "
          "blahblah")
    links, robots, _ = extract_html_py(EXAMPLE, cs)
    assert robots == "index,nofollow"
    assert links == []
    # links before the robots meta survive (the abort is a break)
    cs2 = ("<a href='early.html'>e</a>"
           "<meta name='robots' content='none'>"
           "<a href='late.html'>l</a>")
    assert dests(EXAMPLE, cs2) == ["http://www.example.com/early.html"]
    # IgnoreRobotsPolicy analog: nofollow not obeyed
    assert len(links_of(EXAMPLE, cs, obey_meta_robots_nofollow=False)) == 1


def test_bad_relative_links():
    # HER-1268: late colons must not read as absolute-URI schemes
    cs = ('<a href="example.html;jsessionid=deadbeef:deadbeed'
          '?parameter=this:value"/>'
          '<a href="example.html?parameter=this:value"/>')
    ds = dests(EXAMPLE, cs)
    assert any(
        "/example.html;jsessionid=deadbeef:deadbeed?parameter=this:value"
        in d for d in ds)
    assert any("/example.html?parameter=this:value" in d for d in ds)


def test_speculative_link_extraction():
    # HER-1524: same-host speculative strings keep the page's scheme
    cs = ('<script type="text/javascript">'
          '_parameter="www.anotherexample.com";'
          '_anotherparameter="www.example.com/index.html";</script>')
    ds = dests("https://www.example.com", cs)
    assert "http://www.anotherexample.com/" in ds
    assert "https://www.example.com/index.html" in ds
    hops = {u: h for u, _, h in links_of("https://www.example.com", cs)}
    assert hops["http://www.anotherexample.com/"] == "X"


def test_script_tag_writing_script_type():
    # HER-1526: script-written TYPE strings must not become links
    cs = ('<script type="text/javascript">'
          'var gaJsHost = (("https:" == document.location.protocol) '
          '? "https://ssl." : "http://www.");'
          ' document.write(unescape("%3Cscript src=\'" + gaJsHost + '
          '"google-analytics.com/ga.js\' '
          "type='text/javascript'%3E%3C/script%3E\"));"
          '</script>')
    assert links_of("http://www.example.com/en/fiche/dossier/322/", cs) == []


def test_outlinks_with_base_href():
    cs = ('<base href="http://www.example.com/">'
          '<a href="def/another1.html">'
          '<a href="ghi/another2.html">')
    ds = sorted(dests("http://www.example.com/abc/index.html", cs))
    assert ds[1] == "http://www.example.com/def/another1.html"
    assert ds[2] == "http://www.example.com/ghi/another2.html"
    # the base href itself is also a navlink (processLink before set)
    assert ds[0] == "http://www.example.com/"


FLASH_OBJECT = (
    '<object classid="clsid:D27CDB6E-AE6D-11cf-96B8-444553540000" '
    'codebase="http://download.macromedia.com/pub/shockwave/cabs/flash/'
    'swflash.cab#version=9,0,28,0" id="ZoomifySlideshowViewer" '
    'height="372" width="590">\n'
    '    <param name="flashvars" '
    'value="zoomifyXMLPath=ParamZoomifySlideshowViewer.xml">\n'
    '    <param name="menu" value="false">\n'
    '    <param name="bgcolor" value="#000000">\n'
    '    <param name="src" value="ZoomifySlideshowViewer.swf">\n'
    '    <embed flashvars="zoomifyXMLPath=EmbedZoomifySlideshowViewer.xml" '
    'src="ZoomifySlideshowViewer.swf" menu="false" bgcolor="#000000" '
    'pluginspage="http://www.adobe.com/go/getflashplayer" '
    'type="application/x-shockwave-flash" name="ZoomifySlideshowViewer" '
    'height="372" width="590">\n'
    "</object> ")


def test_flashvars_param_value():
    # HER-1728: <param name=flashvars value=...> query values probed
    ds = dests("http://www.example.com/", FLASH_OBJECT)
    assert "http://www.example.com/ParamZoomifySlideshowViewer.xml" in ds


def test_flashvars_embed_attribute():
    # HER-1728: flashvars= attribute on <embed> probed immediately
    ds = dests("http://www.example.com/", FLASH_OBJECT)
    assert "http://www.example.com/EmbedZoomifySlideshowViewer.xml" in ds


def test_frames_as_navlinks_option():
    cs = '<iframe src="inner.html"></iframe>'
    assert links_of(EXAMPLE, cs)[0][2] == "E"
    assert links_of(EXAMPLE, cs, treat_frames_as_embeds=False)[0][2] == "L"


def test_link_element_href_is_embed():
    links = links_of(EXAMPLE, '<link rel="stylesheet" href="s.css">')
    assert links == [("http://www.example.com/s.css", "link/@href", "E")]


def test_style_attribute_and_style_tag_css():
    cs = ('<div style="background: url(bg.gif)">x</div>'
          "<style type='text/css'>@import url(imported.css);</style>")
    links = links_of(EXAMPLE, cs)
    assert ("http://www.example.com/bg.gif", "=EMBED_MISC", "E") in links
    assert ("http://www.example.com/imported.css", "=EMBED_MISC", "E") in links


def test_javascript_href_scanned_not_linked():
    cs = "<a href=\"javascript:open('http://popup.example/w.html')\">x</a>"
    links = links_of(EXAMPLE, cs)
    assert links == [("http://popup.example/w.html", "=JS_MISC", "X")]


def test_onclick_handler_scanned():
    cs = '<a onclick="go(\'http://handler.example/h.html\')">x</a>'
    links = links_of(EXAMPLE, cs)
    assert ("http://handler.example/h.html", "=JS_MISC", "X") in links


def test_applet_code_gains_class_and_codebase_resolution():
    cs = ('<applet codebase="http://java.example/lib/" code="Main" '
          "width=1 height=1></applet>")
    links = links_of(EXAMPLE, cs)
    assert ("http://java.example/lib/", "applet/@codebase", "E") in links
    assert ("http://java.example/lib/Main.class", "applet", "E") in links


def test_meta_refresh_emits_refer():
    cs = '<meta http-equiv="refresh" content="5;url=next.html">'
    links = links_of(EXAMPLE, cs)
    assert links == [("http://www.example.com/next.html", "meta", "R")]


def test_comments_skipped():
    assert links_of(EXAMPLE, '<!-- <a href="hidden.html">x</a> -->') == []


def test_is_html_expected_here():
    assert is_html_expected_here("http://x.example/page.html")
    assert is_html_expected_here("http://x.example/")
    assert not is_html_expected_here("http://x.example/img/photo.jpeg")
    assert not is_html_expected_here("http://x.example/clip.mp4")
    # extension too long to recognize => HTML is fine (:842-845)
    assert is_html_expected_here("http://x.example/file.verylongext")


def test_spark_udf_matches_python_twin(spark):
    from pyspark.sql import functions as F

    from heritrix_spark.operators.html_extract import (
        html_meta_robots,
        html_outlinks,
    )

    rows = [
        ("http://www.archive.org/start/", VALID_TEST_DATA[0][0]),
        ("http://www.example.com/abc/index.html",
         '<base href="http://www.example.com/"><a href="def/a.html">'),
        ("https://www.example.com",
         '<script>x="www.example.com/i.html";</script>'),
        ("http://www.example.com",
         "<meta name='robots' content='index,nofollow'>"
         "<a href='nope.html'>x</a>"),
        ("http://www.example.com/", FLASH_OBJECT),
    ]
    df = spark.createDataFrame(rows, ["url", "body"])
    got = (
        df.select(
            "url",
            html_outlinks(F.col("url"), F.col("body")).alias("links"),
            html_meta_robots(F.col("url"), F.col("body")).alias("robots"),
        )
        .orderBy("url")
        .collect()
    )
    for r in got:
        body = next(b for u, b in rows if u == r["url"])
        exp_links, exp_robots, _ = extract_html_py(r["url"], body)
        assert [(x["uri"], x["context"], x["hop"]) for x in r["links"]] == \
            list(exp_links)
        assert r["robots"] == exp_robots
