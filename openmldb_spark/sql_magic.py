"""IPython ``%sql`` / ``%%sql`` magic over the DBAPI driver — the twin
of the reference SDK's notebook surface
(python/openmldb/sql_magic/sql_magic.py):

- a cell body has newlines flattened to spaces before execution (:32)
- SELECT statements fetch all rows and print an ASCII table of the
  result-set schema names + rows (:35-39; the reference renders via
  PrettyTable — not in this environment, so ``print_table`` emits the
  same +---+ box format directly)
- every other statement executes and prints "Success to execute sql"
  (:41-42)
- ``register(db, test=True)`` uses IPython's testing shell
  (globalipapp), exactly like the reference's own sql_magic_test.py
"""

from __future__ import annotations

try:
    from IPython.core.magic import (Magics, line_cell_magic,
                                    magics_class)
except ImportError:  # pragma: no cover - IPython is present in CI
    raise


def print_table(schema, rows) -> None:
    """PrettyTable-style default box rendering (sdk.py:494-498):
    +----+----+ borders, centered headers, left-padded cells."""
    schema = list(schema)
    cells = [["" if v is None else str(v) for v in row] for row in rows]
    widths = [max([len(str(h))] + [len(r[i]) for r in cells])
              for i, h in enumerate(schema)]
    sep = "+" + "+".join("-" * (w + 2) for w in widths) + "+"
    head = "|" + "|".join(f" {str(h).center(w)} "
                          for h, w in zip(schema, widths)) + "|"
    print(sep)
    print(head)
    print(sep)
    for r in cells:
        print("|" + "|".join(f" {c.ljust(w)} "
                             for c, w in zip(r, widths)) + "|")
    print(sep)


@magics_class
class SqlMagic(Magics):
    """One cursor per registered magic; a cell body is flattened to a
    single line, SELECTs render a table, other statements confirm."""

    def __init__(self, shell, db):
        super().__init__(shell)
        self.db = db
        self.cursor = db.cursor()

    @line_cell_magic
    def sql(self, line, cell=None):
        text = line if cell is None else cell.replace("\n", " ")
        if not text.strip().lower().startswith("select"):
            self.cursor.execute(text)
            print("Success to execute sql")
            return
        result = self.cursor.execute(text)
        print_table((col["name"]
                     for col in self.cursor.get_resultset_schema()),
                    result.fetchall())


def register(db, test=False):
    if test:
        from IPython.testing.globalipapp import get_ipython
    else:  # pragma: no cover - interactive path
        from IPython import get_ipython
    shell = get_ipython()
    shell.register_magics(SqlMagic(shell, db))
    return shell
