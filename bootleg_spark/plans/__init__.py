"""End-to-end pipeline plans (pages → triples) + checkpoint manifest."""
