"""XLS source — parity with the reference's xlrd read
(/root/reference/dasladen/task.py:321-328).

Workbooks are driver-side, non-splittable artifacts (as in the
reference); pandas parses them and the rows become a distributed
DataFrame. Excel engines (openpyxl/xlrd) are not installed in this
container, so the reader is gated behind an import-try with a clear
error; tests skip when absent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def excel_available() -> bool:
    try:
        import openpyxl  # noqa: F401

        return True
    except ImportError:
        pass
    try:
        import xlrd  # noqa: F401

        return True
    except ImportError:
        return False


def read_xls(
    spark: SparkSession,
    path: str,
    sheet: str | int | None = None,
    all_strings: bool = True,
    use_view: bool = True,
) -> DataFrame:
    """Read one sheet (name, index, or first). all_strings mirrors the
    engine's CSV policy: values land as strings, `convert` types them.

    ``use_view`` is the reference's xlview flag (task.py:328: petl
    ``fromxls(..., use_view=True)`` reads FORMATTED cell values via
    xlutils.view; False reads raw stored values). pandas' readers
    return converted values either way, so True is the natural mode;
    False additionally strips pandas' date coercion by reading
    everything as object — the closest raw-cell analogue."""
    if not excel_available():
        raise RuntimeError(
            "no Excel engine installed (openpyxl/xlrd); install one to use"
            " xls sources"
        )
    import pandas as pd

    kwargs = {} if use_view else {"dtype": object}
    pdf = pd.read_excel(path, sheet_name=0 if sheet is None else sheet, **kwargs)
    if all_strings:
        pdf = pdf.astype("string").where(pdf.notna(), None)
    return spark.createDataFrame(pdf)


def read_xls_many(
    spark: SparkSession,
    glob_path: str,
    schema: str,
    sheet: str | int | None = None,
    parser=None,
) -> DataFrame:
    """Distributed many-workbook read: `binaryFile` ships each
    workbook's bytes to an executor, `mapInPandas` parses it there —
    the scale path when there are thousands of small workbooks (one
    task per file, no driver bottleneck).

    ``schema`` is the output schema (workbooks must agree).
    ``parser(bytes) -> pandas.DataFrame`` defaults to
    ``pd.read_excel`` on the given sheet; tests inject a fake parser
    since no Excel engine ships in this container.
    """
    import io

    if parser is None:
        if not excel_available():
            raise RuntimeError(
                "no Excel engine installed (openpyxl/xlrd); install one or"
                " pass parser="
            )
        import pandas as pd

        def parser(raw: bytes):
            return pd.read_excel(
                io.BytesIO(raw), sheet_name=0 if sheet is None else sheet
            )

    files = spark.read.format("binaryFile").load(glob_path)

    def parse(batches):
        for pdf in batches:
            for raw in pdf["content"]:
                yield parser(bytes(raw))

    return files.select("content").mapInPandas(parse, schema=schema)
