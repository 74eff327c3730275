"""Frontend state-machine contract tests (VERDICT r2 #8).

No JS engine exists offline (no node/deno/quickjs), so ``index.js`` keeps
its state->DOM mapping in JSON-literal tables (``BADGES``, ``RESULT_KEYS``)
that these tests PARSE and assert against the reference component's
semantics (``app/frontend/src/components/Main.vue:128-187``).  The
transition structure (init -> loading -> done|error, alert-on-error) is
asserted on the handler source.  A regressed badge state, result row, or
transition fails here.
"""

import json
import os
import re

import pytest

STATIC = os.path.join(os.path.dirname(__file__), "..", "icee_tpu", "serve",
                      "static")


@pytest.fixture(scope="module")
def js():
    with open(os.path.join(STATIC, "index.js")) as f:
        return f.read()


@pytest.fixture(scope="module")
def html():
    with open(os.path.join(STATIC, "index.html")) as f:
        return f.read()


def _json_literal(js, name):
    m = re.search(rf"var {name} = (\{{.*?\}}|\[.*?\]);", js, re.S)
    assert m, f"{name} JSON literal missing from index.js"
    return json.loads(m.group(1))


def test_badge_states_match_reference(js):
    """The four badge states render exactly Main.vue's classes/texts
    (Main.vue:92-97: secondary '-', primary 'loading...', success 'done!',
    danger 'error')."""
    badges = _json_literal(js, "BADGES")
    assert badges == {
        "init": ["badge badge-pill badge-secondary", "-"],
        "loading": ["badge badge-pill badge-primary", "loading..."],
        "done": ["badge badge-pill badge-success", "done!"],
        "error": ["badge badge-pill badge-danger", "error"],
    }
    # render() consumes the table (not a parallel if/else re-implementation)
    assert "BADGES[state.status]" in js
    assert 'BADGES["init"]' in js  # unknown status falls back to init


def test_result_rows_are_the_four_models(js, html):
    """One result row per served model (Main.vue:156-185 renders nic,
    nic_att, stylenet, stylenet_att), each with a matching DOM id."""
    keys = _json_literal(js, "RESULT_KEYS")
    assert keys == ["nic", "nic_att", "stylenet", "stylenet_att"]
    assert "RESULT_KEYS.forEach" in js
    for k in keys:
        assert re.search(rf'id="{k}"', html), f"result row #{k} missing"


def test_dom_contract_ids_present(js, html):
    """Every id render()/the handlers touch exists in index.html."""
    for el_id in re.findall(r'el\("([^"]+)"\)', js):
        assert re.search(rf'id="{el_id}"', html), f"#{el_id} missing in html"
    assert 'name="mode"' in html  # the radio group generate() reads


def test_transition_structure(js):
    """init -> loading (before fetch) -> done (resolve) | error + alert
    (reject), mirroring Main.vue's axios handlers (:175-183)."""
    gen = js[js.index('el("generate")'):]
    i_loading = gen.index('state.status = "loading"')
    i_fetch = gen.index("fetch(")
    i_done = gen.index('state.status = "done"')
    i_error = gen.index('state.status = "error"')
    assert i_loading < i_fetch < i_done < i_error
    # the catch alert()s the server's error body
    catch_block = gen[gen.index(".catch("):]
    assert "window.alert(err.message)" in catch_block
    # a non-ok response surfaces the response text as the error
    assert "resp.text()" in gen and "throw new Error(t)" in gen


def test_initial_state_and_placeholder(js):
    """Initial state matches Main.vue data(): 'Choose file' label, factual
    mode, init status, '-' rows, SVG placeholder thumbnail."""
    assert 'filename: "Choose file"' in js
    assert 'mode: "factual"' in js
    assert 'status: "init"' in js
    assert "data:image/svg+xml" in js
    m = re.search(r"result: \{(.*?)\},", js, re.S)
    assert m and m.group(1).count('"-"') == 4


def test_mode_query_and_multipart(js):
    """generate() POSTs multipart form data to /generate?mode=<radio>
    (Main.vue:163-174)."""
    assert '"/generate?mode=" + state.mode' in js
    assert "new FormData()" in js
    assert 'form.append("file", state.file, state.file.name)' in js
    assert re.search(r'input\[name="mode"\]:checked', js)
