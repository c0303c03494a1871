"""Bundle tests: lookups + Spark SQL over a registered bundle."""

import io

import pytest

from pdtable_spark import read_csv
from pdtable_spark.store import TableBundle, TableNameNotUniqueInBundleError

CSV = """**alpha;
all
a
-
1
2

**beta;
all
b
text
x

**alpha;
all
a
-
3

"""


@pytest.fixture()
def bundle(spark):
    return TableBundle(read_csv(io.StringIO(CSV)))


def test_len_iter_contains(bundle):
    assert len(bundle) == 3
    assert {t.name for t in bundle} == {"alpha", "beta"}
    assert set(bundle.keys()) == {"alpha", "beta"}
    assert "alpha" in bundle and "gamma" not in bundle


def test_unique_and_all(bundle):
    assert bundle.unique("beta").name == "beta"
    with pytest.raises(TableNameNotUniqueInBundleError):
        bundle.unique("alpha")
    assert len(bundle.all("alpha")) == 2
    with pytest.raises(LookupError):
        bundle.unique("gamma")


def test_positional_and_attribute_access(bundle):
    assert bundle[1].name == "beta"
    assert bundle.beta.name == "beta"
    with pytest.raises(AttributeError):
        bundle.gamma


def test_register_views_sql(spark, bundle):
    views = bundle.register_views()
    assert views == ["beta"]  # alpha ambiguous -> skipped
    assert spark.sql("SELECT count(*) AS n FROM beta").collect()[0]["n"] == 1
