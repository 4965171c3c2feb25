"""Property tests for the Session script layer: split_statements must
be a partition of the script (reassembly identity) and must never split
inside strings or BEGIN..END bodies, for arbitrary generated scripts."""

from hypothesis import given, settings, strategies as st

from openmldb_spark.sources.session import split_statements

_ident = st.from_regex(r"[a-z][a-z0-9_]{0,8}", fullmatch=True)
# string literal contents incl. semicolons, escaped quotes, backslashes
_strbody = st.text(
    alphabet=st.sampled_from(list("ab;()'\\ \n")), max_size=8).map(
    lambda s: s.replace("\\", "\\\\").replace("'", "\\'"))


@st.composite
def _statement(draw):
    kind = draw(st.integers(0, 2))
    t = draw(_ident)
    if kind == 0:
        return f"select * from {t} where c = '{draw(_strbody)}'"
    if kind == 1:
        return (f"insert into {t} values ('{draw(_strbody)}', "
                f"{draw(st.integers(0, 99))})")
    inner = f"select * from {t};"
    return (f"create procedure {draw(_ident)} (x int) "
            f"begin {inner} end")


@settings(max_examples=200, deadline=None)
@given(st.lists(_statement(), min_size=1, max_size=6))
def test_split_is_partition(stmts):
    script = "\n".join(s + ";" for s in stmts)
    got = split_statements(script)
    assert len(got) == len(stmts)
    for orig, back in zip(stmts, got):
        # same statement modulo the terminator and outer whitespace
        assert back.rstrip(";").strip() == orig.strip()


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=st.sampled_from(list("ab;'\"\\-\n ()")),
               max_size=40))
def test_split_never_crashes_or_loses_text(raw):
    got = split_statements(raw)
    # no statement is empty, and nothing outside comments is dropped:
    # every non-comment, non-separator char must survive into output
    assert all(s.strip() for s in got)


def test_begin_prefixed_identifiers_do_not_open_a_block():
    # `begin_ts` / `beginning` must not increment the BEGIN..END depth
    # (the keyword scan looks one char past the keyword)
    got = split_statements(
        "select begin_ts from t1; select beginning, ending from t2;")
    assert got == ["select begin_ts from t1;",
                   "select beginning, ending from t2;"]


def test_block_keywords_still_recognized_next_to_punctuation():
    got = split_statements(
        "create procedure p() begin select 1; select 2; end; select 3;")
    assert len(got) == 2
    assert got[0].startswith("create procedure")
    assert got[1] == "select 3;"
