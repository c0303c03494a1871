"""Load-orchestrator tests: includes, folder scan, loop detection, root
confinement, lineage trees, parquet members, excel gating.

Models reference ``pdtable/test/io/test_load.py`` (include resolution +
lineage-tree golden string, root-folder confinement error, loop detection).
"""

import re

import pytest

from pdtable_spark.io.load import (
    LoadError,
    load_files,
    make_location_trees,
)
from pdtable_spark.model.origin import CollectingInputIssueTracker, InputError
from pdtable_spark.parsers.blocks import BlockType
from pdtable_spark.store import TableBundle

INPUT_CSV = """***include;
bar.csv
sub/baz.csv

**alpha;
all
a
-
1
2

"""

BAR_CSV = """**beta;
all
b
text
x
y

"""

BAZ_CSV = """**gamma;
all
c
-
3.5

"""


@pytest.fixture
def input_folder(tmp_path):
    (tmp_path / "input_foo.csv").write_text(INPUT_CSV)
    (tmp_path / "bar.csv").write_text(BAR_CSV)
    (tmp_path / "sub").mkdir()
    (tmp_path / "sub" / "baz.csv").write_text(BAZ_CSV)
    return tmp_path


def test_load_files_with_includes(spark, input_folder):
    blocks = load_files([str(input_folder / "input_foo.csv")])
    bundle = TableBundle(blocks)
    assert sorted(t.name for t in bundle) == ["alpha", "beta", "gamma"]
    assert bundle["gamma"]["c"].unit == "-"


def test_demo_directive_handlers(spark, input_folder):
    """The worked demo handlers: ***include expansion as a plain stream
    transform over read_csv, and a stateful custom ***context directive."""
    import io as _io

    from pdtable_spark.demo import handle_includes
    from pdtable_spark.demo.directive_handlers import handle_context
    from pdtable_spark.io.csv import read_csv
    from pdtable_spark.parsers.blocks import BlockType

    # include expansion (demo form, no loader machinery)
    blocks = list(handle_includes(read_csv(input_folder / "input_foo.csv"), input_folder, recursive=True))
    names = [b.name for bt, b in blocks if bt == BlockType.TABLE]
    assert sorted(names) == ["alpha", "beta", "gamma"]
    assert not any(bt == BlockType.DIRECTIVE and b.name == "include" for bt, b in blocks)

    # custom stateful directive: context lines attach to following tables
    src = _io.StringIO(
        "***context;\nproject_x;\nrev_2;\n\n**t1;\nall;\na;\n-;\n1;\n\n"
    )
    blocks2 = list(handle_context(read_csv(src)))
    tables = [b for bt, b in blocks2 if bt == BlockType.TABLE]
    assert tables and tables[0].metadata.context == ["project_x", "rev_2"]


def test_custom_directive_through_load_files(spark, input_folder):
    """Directives other than ***include flow through load_files untouched,
    so client handlers compose downstream of the production loader."""
    from pdtable_spark.demo.directive_handlers import handle_context
    from pdtable_spark.parsers.blocks import BlockType

    (input_folder / "ctx.csv").write_text(
        "***context;\nfrom_load_files;\n\n**delta;\nall;\nd;\n-;\n4.0;\n\n"
    )
    blocks = list(handle_context(load_files([str(input_folder / "ctx.csv")])))
    tables = [b for bt, b in blocks if bt == BlockType.TABLE]
    assert [t.name for t in tables] == ["delta"]
    assert tables[0].metadata.context == ["from_load_files"]


def test_folder_scan_with_root(spark, input_folder):
    # root scan: only input_* matches at top level; includes pull in the rest
    blocks = load_files(
        ["/"], root_folder=input_folder, file_name_start_pattern=r"^input_"
    )
    bundle = TableBundle(blocks)
    assert sorted(t.name for t in bundle) == ["alpha", "beta", "gamma"]


def test_location_tree(spark, input_folder):
    blocks = load_files(
        ["/"], root_folder=input_folder, file_name_start_pattern=r"^input_"
    )
    bundle = TableBundle(blocks)
    trees = make_location_trees(iter(bundle))
    rendered = "\n".join(str(n) for n in sorted(trees, key=str))
    # root folder at top; included files are children of the including file
    assert "<root_folder>" in rendered
    assert "**alpha" in rendered and "**beta" in rendered and "**gamma" in rendered
    # bar.csv must be nested under input_foo.csv (include lineage)
    lines = rendered.splitlines()
    foo_idx = next(i for i, ln in enumerate(lines) if "input_foo.csv" in ln)
    bar_idx = next(i for i, ln in enumerate(lines) if re.search(r"\bbar.csv", ln))
    foo_indent = len(lines[foo_idx]) - len(lines[foo_idx].lstrip())
    bar_indent = len(lines[bar_idx]) - len(lines[bar_idx].lstrip())
    assert bar_indent > foo_indent


def test_include_loop_detected(tmp_path):
    (tmp_path / "a.csv").write_text("***include;\nb.csv\n\n")
    (tmp_path / "b.csv").write_text("***include;\na.csv\n\n")
    tracker = CollectingInputIssueTracker()
    list(load_files([str(tmp_path / "a.csv")], issue_tracker=tracker))
    assert not tracker.is_ok
    assert any("multiple times" in str(i.issue) for i in tracker.issues)


def test_include_loop_raises_with_null_tracker(tmp_path):
    (tmp_path / "a.csv").write_text("***include;\na.csv\n\n")
    with pytest.raises(InputError, match="multiple times"):
        list(load_files([str(tmp_path / "a.csv")]))


def test_root_folder_confinement(tmp_path):
    inside = tmp_path / "root"
    inside.mkdir()
    (inside / "a.csv").write_text("***include;\n/../escape.csv\n\n")
    (tmp_path / "escape.csv").write_text(BAR_CSV)
    with pytest.raises((LoadError, InputError)):
        list(load_files(["/a.csv"], root_folder=inside))


def test_relative_root_without_source_rejected(tmp_path):
    with pytest.raises((LoadError, InputError)):
        list(load_files(["relative.csv"]))


def test_parquet_load_item(spark, tmp_path):
    (tmp_path / "main.csv").write_text("***include;\nregion.parquet\n\n" + BAR_CSV)
    import shutil

    shutil.copy("/root/testdata/sf0.001/region.parquet", tmp_path / "region.parquet")
    blocks = load_files([str(tmp_path / "main.csv")], spark=spark)
    bundle = TableBundle(blocks)
    assert sorted(t.name for t in bundle) == ["beta", "region"]
    assert bundle["region"].count() == 5


def test_corrupt_excel_load_item_reports_issue(tmp_path):
    (tmp_path / "wb.xlsx").write_bytes(b"not a zip")
    tracker = CollectingInputIssueTracker()
    list(load_files([str(tmp_path / "wb.xlsx")], issue_tracker=tracker))
    assert not tracker.is_ok


def test_excel_in_input_set(spark, tmp_path):
    from pdtable_spark.io.excel import write_excel

    import io as _io

    from pdtable_spark.io.csv import read_csv

    csv = "**wb_table;\nall\na;b\n-;text\n1.5;x\n2.5;y\n\n"
    bundle = TableBundle(read_csv(_io.StringIO(csv)))
    write_excel(bundle["wb_table"], tmp_path / "wb.xlsx")
    out = TableBundle(load_files([str(tmp_path / "wb.xlsx")]))
    assert bundle["wb_table"].equals(out["wb_table"])


def test_filtered_blocks_pass_through(spark, input_folder):
    blocks = load_files([str(input_folder / "bar.csv")])
    kinds = [bt for bt, _ in blocks]
    assert BlockType.TABLE in kinds


def test_orc_load_item(spark, tmp_path):
    """FileReader dispatches .orc members: one ORC file → one table block."""
    import glob
    import shutil

    (tmp_path / "main.csv").write_text("***include;\nnation.orc\n\n" + BAR_CSV)
    spark.read.parquet("/root/testdata/sf0.001/nation.parquet").coalesce(1).write.orc(
        str(tmp_path / "orc_out")
    )
    part = glob.glob(str(tmp_path / "orc_out" / "part-*.orc"))[0]
    shutil.copy(part, tmp_path / "nation.orc")
    blocks = load_files([str(tmp_path / "main.csv")], spark=spark)
    bundle = TableBundle(blocks)
    assert sorted(t.name for t in bundle) == ["beta", "nation"]
    assert bundle["nation"].count() == 25
