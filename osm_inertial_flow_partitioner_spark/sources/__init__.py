"""Sources and sinks: fixture graph generators, synthetic Common-Crawl
pages, geo-entity extraction, and graph/assignment I/O."""
