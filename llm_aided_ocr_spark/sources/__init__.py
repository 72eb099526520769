from llm_aided_ocr_spark.sources.synthetic import (
    generate_pages_rows,
    pages_dataframe,
    PAGES_SCHEMA,
)

__all__ = ["generate_pages_rows", "pages_dataframe", "PAGES_SCHEMA"]
