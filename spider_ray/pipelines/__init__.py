"""Dataset pipelines: the crawl scheduler, scrape entry points, dedup
families, text analysis, ANN search."""
