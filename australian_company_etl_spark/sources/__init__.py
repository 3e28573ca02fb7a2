from australian_company_etl_spark.sources.registry import TABLES, load_tables, register_views

__all__ = ["TABLES", "load_tables", "register_views"]
