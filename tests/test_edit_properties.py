"""Property tests for the edit subsystem: emit/load idempotence and
crash-freedom under random op sequences (hypothesis)."""

from hypothesis import given, settings, strategies as st

from exstruct_ray.edit import (
    EditWorkbook,
    apply_ops,
    emit_parts,
    load_workbook,
)
from exstruct_ray.edit.model import col_index_to_label
from exstruct_ray.ooxml.package import VirtualPackage

_cell_refs = st.tuples(
    st.integers(min_value=1, max_value=20), st.integers(min_value=1, max_value=8)
).map(lambda rc: f"{col_index_to_label(rc[1])}{rc[0]}")

_values = st.one_of(
    st.integers(min_value=-10**9, max_value=10**9),
    st.text(
        alphabet=st.characters(
            whitelist_categories=("L", "N", "P", "Zs"), max_codepoint=0x2FFF
        ),
        max_size=20,
    ).filter(lambda s: not s.startswith("=")),
    st.none(),
)

_set_value_ops = st.fixed_dictionaries(
    {
        "op": st.just("set_value"),
        "sheet": st.just("S"),
        "cell": _cell_refs,
        "value": _values,
    }
)
_style_ops = st.one_of(
    st.fixed_dictionaries(
        {"op": st.just("set_bold"), "sheet": st.just("S"), "cell": _cell_refs}
    ),
    st.fixed_dictionaries(
        {
            "op": st.just("set_fill_color"),
            "sheet": st.just("S"),
            "cell": _cell_refs,
            "fill_color": st.sampled_from(["FF0000", "00FF00", "#0000FF"]),
        }
    ),
    st.fixed_dictionaries(
        {
            "op": st.just("set_font_size"),
            "sheet": st.just("S"),
            "cell": _cell_refs,
            "font_size": st.floats(min_value=1, max_value=72),
        }
    ),
)


def _roundtrip(workbook: EditWorkbook) -> EditWorkbook:
    return load_workbook(VirtualPackage(emit_parts(workbook)))


class TestEmitLoadIdempotence:
    @settings(max_examples=40, deadline=None)
    @given(ops=st.lists(st.one_of(_set_value_ops, _style_ops), max_size=12))
    def test_emit_load_emit_stable(self, ops):
        """One load normalizes (numeric strings coerce, extractor parity);
        after that, load→emit is a fixed point byte-for-byte."""
        workbook = EditWorkbook()
        workbook.add_sheet("S")
        result = apply_ops(workbook, ops)
        assert result.error is None, result.error
        normalized = _roundtrip(workbook)
        first = emit_parts(normalized)
        second = emit_parts(_roundtrip(normalized))
        assert first == second

    @settings(max_examples=25, deadline=None)
    @given(
        ops=st.lists(st.one_of(_set_value_ops, _style_ops), max_size=8),
        ranges=st.lists(
            st.tuples(
                st.integers(min_value=1, max_value=6),
                st.integers(min_value=1, max_value=4),
            ),
            max_size=2,
        ),
    )
    def test_values_survive_roundtrip(self, ops, ranges):
        workbook = EditWorkbook()
        workbook.add_sheet("S")
        result = apply_ops(workbook, ops)
        assert result.error is None
        for r, c in ranges:
            ref = f"{col_index_to_label(c)}{r}:{col_index_to_label(c + 1)}{r + 1}"
            sub = apply_ops(
                workbook, [{"op": "merge_cells", "sheet": "S", "range": ref}]
            )
            if sub.error is not None:
                continue  # overlap rejected — fine
        reloaded = _roundtrip(workbook)
        src = workbook.sheets["S"]
        dst = reloaded.sheets["S"]
        for key, cell in src.cells.items():
            if cell.value in (None, "") and cell.formula is None:
                continue
            got = dst.cells.get(key)
            assert got is not None, key
            # numeric strings legitimately coerce on reload ("42" -> 42);
            # everything else must round-trip exactly.
            if isinstance(cell.value, str):
                from exstruct_ray.functions.coerce import (
                    coerce_numeric_preserve_format,
                )

                assert got.value == coerce_numeric_preserve_format(cell.value)
            else:
                assert got.value == cell.value
        assert sorted(dst.merged) == sorted(src.merged)
