"""Gate-fixture hygiene: every workload gate that materializes a cached
dataset must OWN its leaf name. Two gates sharing a leaf (and especially
a marker file) silently clobber each other's fixtures — the r13 incident:
a new gate reused ``ivf_maintained`` + ``_MAINTAINED`` and each gate then
trusted the OTHER's fixture through the shared marker, flipping two
previously-green oracle rows to hash mismatches. Sharing is sanctioned
only by CALLING the owning gate (ann_batch_search_rest ->
q_ivf_index_append), never by spelling the same leaf twice."""

import ast
import os

import s3parq_spark

PKG = os.path.dirname(s3parq_spark.__file__)

#: leafs legitimately referenced from more than one function: the extra
#: reference must CALL the owner to build (listed here after review)
SANCTIONED = {
    "ivf_maintained": {"q_ivf_index_append", "q_ann_batch_search_rest"},
}


def _leaf_claims():
    claims = {}
    for mod in ("workload.py", "workload_ext.py", "workload_ext2.py"):
        tree = ast.parse(open(os.path.join(PKG, mod)).read())
        for node in ast.walk(tree):
            if not isinstance(node, ast.FunctionDef):
                continue
            for call in ast.walk(node):
                if (
                    isinstance(call, ast.Call)
                    and isinstance(call.func, ast.Name)
                    and call.func.id == "_ds_path"
                    and len(call.args) == 2
                    and isinstance(call.args[1], ast.Constant)
                ):
                    leaf = call.args[1].value
                    claims.setdefault(leaf, set()).add(node.name)
    return claims


def test_fixture_leaf_names_are_uniquely_owned():
    conflicts = {
        leaf: sorted(fns)
        for leaf, fns in _leaf_claims().items()
        if len(fns) > 1 and fns != SANCTIONED.get(leaf)
    }
    assert conflicts == {}, (
        f"fixture leaf claimed by multiple gates: {conflicts} — pick a "
        "unique leaf or call the owning gate to build (then add the "
        "reviewed pair to SANCTIONED)"
    )


def test_sanctioned_sharers_call_the_owner():
    # the sanctioned non-owner must invoke the owner, not rebuild
    src = open(os.path.join(PKG, "workload_ext2.py")).read()
    tree = ast.parse(src)
    fns = {
        n.name: n for n in ast.walk(tree) if isinstance(n, ast.FunctionDef)
    }
    batch = fns["q_ann_batch_search_rest"]
    called = {
        c.func.id
        for c in ast.walk(batch)
        if isinstance(c, ast.Call) and isinstance(c.func, ast.Name)
    }
    assert "q_ivf_index_append" in called


def test_every_marker_writing_gate_validates_state():
    """r14 (verdict #6): a marker file proves only that SOME run finished
    — not that the state on disk is the state the gate needs (interrupted
    multi-member builds, external clobbering, cache surgery). Every
    function that manages a fixture marker must therefore also call a
    ``*_fixture_ok`` helper (``_dataset_fixture_ok`` / ``_ivf_fixture_ok``
    / ``_text_fixture_ok`` / ``_stream_ckpt_fixture_ok`` /
    ``_mor_fixture_ok`` / ...) so a bad fixture self-heals by rebuild
    instead of serving wrong rows or crashing on a post-marker assert."""
    offenders = {}
    for mod in ("workload.py", "workload_ext.py", "workload_ext2.py"):
        tree = ast.parse(open(os.path.join(PKG, mod)).read())
        for node in ast.walk(tree):
            if not isinstance(node, ast.FunctionDef):
                continue
            writes_marker = any(
                isinstance(n, ast.Assign)
                and any(
                    isinstance(t, ast.Name) and t.id == "marker"
                    for t in n.targets
                )
                for n in ast.walk(node)
            )
            if not writes_marker:
                continue
            validates = any(
                isinstance(c, ast.Call)
                and isinstance(c.func, ast.Name)
                and c.func.id.endswith("_fixture_ok")
                for c in ast.walk(node)
            )
            if not validates:
                offenders.setdefault(mod, []).append(node.name)
    assert offenders == {}, (
        f"marker-writing gates without a *_fixture_ok state check: "
        f"{offenders}"
    )


def test_fixture_ok_cache_contract_no_out_of_engine_mutation():
    """r15 (r14 verdict blemish): ``_FIXTURE_OK_CACHE`` memoizes POSITIVE
    validations per process, which silently assumes no gate ever
    bypasses the engine to mutate its own fixture mid-process — an
    out-of-engine mutation after a cached validation would serve stale
    trust. This pins the contract explicitly: any gate that both
    manages a fixture marker AND mutates its fixture out-of-engine
    (shutil/os file surgery on the fixture path AFTER the build) must
    either rebuild from scratch (delete-first, which the leaf-ownership
    test already guarantees is private) or re-validate. Today the only
    out-of-engine mutations in gate code are the crash-window
    manufacturers (``ann_rollback_search``'s renames,
    ``text_crash_repair_search``'s raw append), and each one runs
    INSIDE the marker-guarded build block and converges the fixture
    (rollback / repair) BEFORE writing its marker — validated-at-end
    state is exactly what later processes re-validate. Assert the
    structural half: every ``os.rename``/``shutil.move`` call on gate
    fixtures appears only in functions that also write a marker (i.e.
    inside a guarded build block, never on the cached serve path)."""
    for mod in ("workload.py", "workload_ext.py", "workload_ext2.py"):
        tree = ast.parse(open(os.path.join(PKG, mod)).read())
        # TOP-LEVEL functions only: a nested staging helper (e.g. a
        # stream gate's `land`) belongs to its enclosing gate, whose
        # build block owns the marker
        for node in tree.body:
            if not isinstance(node, ast.FunctionDef):
                continue
            mutates = any(
                isinstance(c, ast.Call)
                and isinstance(c.func, ast.Attribute)
                and c.func.attr in ("rename", "move")
                and isinstance(c.func.value, ast.Name)
                and c.func.value.id in ("os", "shutil")
                for c in ast.walk(node)
            )
            if not mutates:
                continue
            writes_marker = any(
                isinstance(n, ast.Assign)
                and any(
                    isinstance(t, ast.Name) and t.id == "marker"
                    for t in n.targets
                )
                for n in ast.walk(node)
            )
            assert writes_marker, (
                f"{mod}:{node.name} mutates fixture state out-of-engine "
                "(os.rename/shutil.move) without a marker-guarded build "
                "block — the _FIXTURE_OK_CACHE positive memo would keep "
                "trusting the pre-mutation validation"
            )
