"""JerichoExtractorHTML differential (processForm,
JerichoExtractorHTML.java:352-421) — the form-submission GET links its
test battery pins (JerichoExtractorHTMLTest.java:58-148)."""

from __future__ import annotations

from heritrix_spark.operators.html_extract import extract_html_py

FORM = (
    '<form name="testform" method="%s" action="redirect_me?form=true"> '
    '  <INPUT TYPE=CHECKBOX NAME="checked[]" VALUE="1" CHECKED> '
    '  <INPUT TYPE=CHECKBOX NAME="unchecked[]" VALUE="1"> '
    '  <select name="selectBox">'
    '    <option value="selectedOption" selected>option1</option>'
    '    <option value="nonselectedOption">option2</option>'
    "  </select>"
    '  <input type="submit" name="test" value="Go">'
    "</form>"
)

WANT = (
    "/redirect_me?form=true&checked[]=1&unchecked[]=&selectBox="
    "selectedOption&test=Go"
)


def _uris(content, **kw):
    links, _, _ = extract_html_py(
        "http://www.example.org", content, jericho_forms=True, **kw
    )
    return [u for u, _, _ in links]


def test_forms_link_get():
    """testFormsLinkGet: GET form -> action + default field values."""
    assert any(WANT in u for u in _uris(FORM % "GET"))


def test_forms_link_ignore_post():
    """testFormsLinkIgnorePost: POST dropped under extractOnlyFormGets."""
    uris = _uris(FORM % "POST")
    assert not any(WANT in u for u in uris)
    assert not any("redirect_me" in u for u in uris)  # no bare action either


def test_forms_link_find_post():
    """testFormsLinkFindPost: POST extracted when only-GETs is off."""
    assert any(WANT in u for u in _uris(FORM % "POST",
                                        extract_only_form_gets=False))


def test_multiple_attributes_per_element():
    """testMultipleAttributesPerElement: both src and href extracted."""
    uris = _uris('<a src="http://www.example.com/" '
                 'href="http://www.archive.org/"> ')
    assert "http://www.example.com/" in uris
    assert "http://www.archive.org/" in uris


def test_action_with_no_query_gets_question_mark():
    """processForm :409-414: first '&' -> '?' when the action has none."""
    form = ('<form method="GET" action="/go">'
            '<input type="hidden" name="a" value="1">'
            '<input type="text" name="b"></form>')
    assert any(u.endswith("/go?a=1&b=") for u in _uris(form))


def test_select_defaults_to_first_option():
    form = ('<form method="GET" action="/s?x=1">'
            '<select name="c"><option value="v1">a</option>'
            '<option value="v2">b</option></select></form>')
    assert any(u.endswith("/s?x=1&c=v1") for u in _uris(form))


def test_ignore_form_actions_drops_everything():
    """:359-361 — ignoreFormActionUrls suppresses form links entirely."""
    assert not any("redirect_me" in u
                   for u in _uris(FORM % "GET", ignore_form_action_urls=True))


def test_default_mode_unchanged():
    """Without the flag, the plain ExtractorHTML ACTION law holds."""
    links, _, _ = extract_html_py("http://www.example.org", FORM % "GET")
    uris = [u for u, _, _ in links]
    assert any(u.endswith("/redirect_me?form=true") for u in uris)
    assert not any("checked[]" in u for u in uris)
