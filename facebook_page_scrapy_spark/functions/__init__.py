from facebook_page_scrapy_spark.functions import text, urls  # noqa: F401
