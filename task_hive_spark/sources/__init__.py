from task_hive_spark.sources.fixtures import FIXTURE_TABLES, load_table, register_fixture_views

__all__ = ["FIXTURE_TABLES", "load_table", "register_fixture_views"]
