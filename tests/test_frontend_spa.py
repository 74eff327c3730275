"""Routed-SPA frontend contract tests (VERDICT r3 #7, SURVEY S4's second
variant).

The reference ships TWO frontends: the routed Vue 2 SPA
(``app/frontend/src/{main.js,App.vue,router.js,components/Main.vue}``) and
the no-build ``frontend_simplified``.  The rebuild's second variant is the
no-build router shell ``spa.html`` + ``spa-router.js`` + ``spa-main.js`` +
``spa-view-main.js``.  No JS engine exists offline, so — like
``tests/test_frontend_state.py`` — the route table is a parsed JSON literal
and the shell structure is asserted on source.
"""

import json
import os
import re

import pytest

STATIC = os.path.join(os.path.dirname(__file__), "..", "icee_tpu", "serve",
                      "static")


def _read(name):
    with open(os.path.join(STATIC, name)) as f:
        return f.read()


@pytest.fixture(scope="module")
def router_js():
    return _read("spa-router.js")


@pytest.fixture(scope="module")
def view_js():
    return _read("spa-view-main.js")


@pytest.fixture(scope="module")
def spa_html():
    return _read("spa.html")


def test_route_table_matches_reference_router(router_js):
    """router.js declares one named route {path:'/', name:'Main',
    component:Main} (app/frontend/src/router.js:8-16); the no-build shell
    keeps the same table (hash mode instead of history — no URL rewrites
    behind the flat static handler)."""
    m = re.search(r"var ROUTES = (\[.*?\]);", router_js, re.S)
    assert m, "ROUTES JSON literal missing from spa-router.js"
    routes = json.loads(m.group(1))
    assert routes == [{"path": "/", "name": "Main", "component": "Main"}]
    assert '"hash"' in router_js  # declared mode


def test_router_shell_behavior(router_js):
    """Router mechanics: hashchange-driven re-render, unknown-path redirect
    to '/', component template mounted into the router-view slot with the
    mounted() hook invoked."""
    assert "hashchange" in router_js
    assert 'window.location.hash = "#/"' in router_js  # unknown -> redirect
    assert "view.template" in router_js
    assert "view.mounted" in router_js


def test_main_view_reuses_single_state_machine(view_js):
    """The Main component must load index.js — the ONE state-machine
    implementation shared with the simplified variant (its BADGES table is
    contract-tested in tests/test_frontend_state.py) — not re-implement
    fetch/status logic."""
    assert 's.src = "index.js"' in view_js
    for bad in ("fetch(", "BADGES", "loading..."):
        assert bad not in view_js, f"state machine duplicated: {bad}"


def test_main_view_template_has_component_dom(view_js):
    """The template carries every element index.js binds to (Main.vue's
    form, status badge, thumbnail, and the four model result rows)."""
    for needle in ('id="inputFile"', 'id="filename"', 'id="generate"',
                   'id="status"', 'id="thumb"', 'id="nic"', 'id="nic_att"',
                   'id="stylenet"', 'id="stylenet_att"',
                   'value="factual"', 'value="happy"', 'value="sad"',
                   'value="angry"', "jumbotron"):
        assert needle in view_js, f"missing from Main template: {needle}"


def test_spa_shell_structure(spa_html):
    """spa.html is the App shell: an empty #app router-view slot (App.vue's
    template is just <router-view/>) and the Vue-build load order
    components -> router -> app entry (main.js imports)."""
    assert '<div id="app"></div>' in spa_html
    order = [spa_html.index(f'src="{s}"') for s in
             ("spa-view-main.js", "spa-router.js", "spa-main.js")]
    assert order == sorted(order), "script load order must mirror the build"
    # no inline markup: the view comes from the router, not the page
    assert 'id="status"' not in spa_html


def test_entry_mounts_router_on_app(spa_html):
    main_js = _read("spa-main.js")
    assert 'router.mount(document.getElementById("app"))' in main_js
    del spa_html
