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
def test_split_never_crashes_or_emits_blank_statements(raw):
    got = split_statements(raw)
    assert all(s.strip() for s in got)


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.sampled_from(list("ab;'\"\\\n ()")),
               max_size=40))
def test_split_loses_no_characters(raw):
    # comment-free alphabet (no '-'): every char other than whitespace
    # and the ';' separators must survive into the output verbatim
    from collections import Counter

    got = split_statements(raw)

    def keep(s):
        return Counter(c for c in s if not c.isspace() and c != ";")

    assert keep("".join(got)) == keep(raw)


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


def test_case_end_at_top_level_does_not_block_splitting():
    got = split_statements(
        "select case when y=1 then 'a' else 'b' end from t1; select 2;")
    assert got == [
        "select case when y=1 then 'a' else 'b' end from t1;",
        "select 2;"]


def test_case_inside_begin_block_does_not_close_it():
    got = split_statements(
        "create procedure p() begin "
        "select case when a then 1 end from t; end; select 9;")
    assert len(got) == 2
    assert got[1] == "select 9;"


def test_unbalanced_end_never_blocks_later_splits():
    got = split_statements("select 1 end; select 2;")
    assert got == ["select 1 end;", "select 2;"]
