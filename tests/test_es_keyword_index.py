"""Tests for core/es_keyword_index.py — the optional real-Elasticsearch
adapter, with a mocked client in the style of the reference's
tests/test_keyword_store.py:150-340 (no cluster needed).  Asserts drop-in
parity with reference utils/keyword_store.py:105-392: mapping shape, IK
detection/recreation, replica self-heal, text-query boosts, filter shapes,
and score normalization."""

import unittest
from unittest.mock import Mock

from photo_search_engine_tpu.core.es_keyword_index import (
    ElasticsearchKeywordIndex,
)


def _fresh_mock(exists=True, ik=False, ik_mapping=False):
    es = Mock()
    es.indices.exists.return_value = exists
    if ik:
        es.indices.analyze.return_value = {"tokens": [{"token": "照片"}]}
    else:
        es.indices.analyze.side_effect = Exception("ik unavailable")
    if ik_mapping:
        es.indices.get_mapping.return_value = {
            "test_index": {
                "mappings": {
                    "properties": {
                        "description": {
                            "type": "text",
                            "analyzer": "ik_max_word",
                            "search_analyzer": "ik_smart",
                        }
                    }
                }
            }
        }
    else:
        es.indices.get_mapping.return_value = {}
    return es


def _store(es, **kw):
    return ElasticsearchKeywordIndex(index_name="test_index", client=es, **kw)


def _search_kwargs_as_body(call):
    """The adapter sends typed kwargs (query=/size=/min_score=) — removed
    body= support in elasticsearch-py 9.x; reshape for assertions."""
    kw = dict(call.kwargs)
    kw.pop("index", None)
    return kw


class IndexLifecycleTest(unittest.TestCase):
    def test_creates_index_with_full_mapping_when_missing(self):
        es = _fresh_mock(exists=False)
        _store(es)
        es.indices.create.assert_called_once()
        kw = es.indices.create.call_args.kwargs
        body = {"mappings": kw["mappings"], "settings": kw["settings"]}
        props = body["mappings"]["properties"]
        for field in (
            "photo_path", "description", "outer_scene_summary",
            "inner_content_summary", "retrieval_text", "ocr_text",
            "file_name", "media_types", "tags", "identity_names",
            "identity_evidence", "year", "month", "day", "hour",
            "season", "time_period", "weekday", "camera", "datetime",
        ):
            self.assertIn(field, props)
        self.assertEqual(props["year"]["type"], "integer")
        self.assertEqual(props["season"]["type"], "keyword")
        self.assertEqual(props["datetime"]["type"], "date")
        self.assertTrue(props["datetime"]["ignore_malformed"])
        self.assertEqual(body["settings"]["index"]["number_of_replicas"], 0)
        # no IK → plain text analyzer
        self.assertNotIn("analyzer", props["description"])

    def test_ik_analyzer_used_when_available(self):
        es = _fresh_mock(exists=False, ik=True)
        _store(es)
        props = es.indices.create.call_args.kwargs["mappings"]["properties"]
        self.assertEqual(props["description"]["analyzer"], "ik_max_word")
        self.assertEqual(props["description"]["search_analyzer"], "ik_smart")

    def test_recreates_non_ik_index_when_ik_became_available(self):
        # existing index without IK mapping + IK now present → delete+create
        es = _fresh_mock(exists=True, ik=True, ik_mapping=False)
        exists_results = iter([True, False])
        es.indices.exists.side_effect = lambda **kw: next(exists_results)
        _store(es)
        es.indices.delete.assert_called_once_with(index="test_index")
        es.indices.create.assert_called_once()

    def test_existing_ik_index_left_alone_with_replica_self_heal(self):
        es = _fresh_mock(exists=True, ik=True, ik_mapping=True)
        _store(es)
        es.indices.delete.assert_not_called()
        es.indices.create.assert_not_called()
        es.indices.put_settings.assert_called_once()
        body = es.indices.put_settings.call_args.kwargs["settings"]
        self.assertEqual(body["index"]["number_of_replicas"], 0)

    def test_replica_self_heal_failure_is_non_fatal(self):
        es = _fresh_mock(exists=True)
        es.indices.put_settings.side_effect = Exception("cluster busy")
        store = _store(es)  # must not raise
        self.assertEqual(store.index_name, "test_index")

    def test_clear_deletes_and_recreates(self):
        es = _fresh_mock(exists=True)
        store = _store(es)
        es.reset_mock()
        es.indices.exists.side_effect = [True, False, False]
        es.indices.analyze.side_effect = Exception("ik unavailable")
        store.clear()
        es.indices.delete.assert_called_once_with(index="test_index")
        es.indices.create.assert_called_once()


class DocumentTest(unittest.TestCase):
    def setUp(self):
        self.es = _fresh_mock()
        self.store = _store(self.es)
        self.es.reset_mock()

    def test_add_document_requires_mandatory_fields(self):
        with self.assertRaises(ValueError):
            self.store.add_document("1", {"photo_path": "/a.jpg"})
        with self.assertRaises(ValueError):
            self.store.add_document("1", {"description": "x"})

    def test_add_document_indexes_by_id(self):
        doc = {"photo_path": "/a.jpg", "description": "海边"}
        self.store.add_document("abc", doc)
        self.es.index.assert_called_once_with(
            index="test_index", id="abc", document=doc
        )

    def test_delete_document_swallows_missing(self):
        self.es.delete.side_effect = Exception("404")
        self.store.delete_document("ghost")  # must not raise

    def test_document_count_refreshes(self):
        self.es.indices.exists.return_value = True
        self.es.count.return_value = {"count": 7}
        self.assertEqual(self.store.count, 7)
        self.es.indices.refresh.assert_called_once_with(index="test_index")

    def test_save_load_are_interface_noops(self):
        self.store.save()
        self.assertTrue(self.store.load())


class TextQueryTest(unittest.TestCase):
    def setUp(self):
        self.es = _fresh_mock()
        self.store = _store(self.es)
        self.es.reset_mock()

    def _search_body(self):
        return _search_kwargs_as_body(self.es.search.call_args)

    def test_query_shape_boosts_and_phrase(self):
        self.es.search.return_value = {"hits": {"max_score": 2.0, "hits": []}}
        self.store.search("海边 日落", top_k=10)
        body = self._search_body()
        should = body["query"]["bool"]["should"]
        multi = should[0]["multi_match"]
        self.assertEqual(multi["type"], "best_fields")
        self.assertEqual(multi["minimum_should_match"], "60%")
        self.assertIn("retrieval_text^3.0", multi["fields"])
        self.assertIn("description^2.0", multi["fields"])
        self.assertIn("ocr_text^1.5", multi["fields"])
        self.assertIn("file_name^0.8", multi["fields"])
        phrase = should[1]["match_phrase"]["retrieval_text"]
        self.assertEqual(phrase["boost"], 1.4)
        self.assertEqual(body["min_score"], 0.12)
        self.assertEqual(body["size"], 10)

    def test_scores_normalized_by_max(self):
        self.es.search.return_value = {
            "hits": {
                "max_score": 8.0,
                "hits": [
                    {"_source": {"photo_path": "/a.jpg"}, "_score": 8.0},
                    {"_source": {"photo_path": "/b.jpg"}, "_score": 4.0},
                ],
            }
        }
        hits = self.store.search("海边")
        self.assertEqual(hits[0], {"photo_path": "/a.jpg", "score": 1.0})
        self.assertEqual(hits[1], {"photo_path": "/b.jpg", "score": 0.5})

    def test_empty_query_returns_empty_without_call(self):
        self.assertEqual(self.store.search(""), [])
        self.assertEqual(self.store.search("   "), [])
        self.es.search.assert_not_called()

    def test_search_failure_degrades_to_empty(self):
        self.es.search.side_effect = Exception("cluster down")
        self.assertEqual(self.store.search("海边"), [])


class FilterTest(unittest.TestCase):
    def setUp(self):
        self.es = _fresh_mock()
        self.store = _store(self.es)
        self.es.reset_mock()
        self.es.search.return_value = {
            "hits": {
                "max_score": 5.0,
                "hits": [{"_source": {"photo_path": "/x.jpg"}, "_score": 5.0}],
            }
        }

    def _search_body(self):
        return _search_kwargs_as_body(self.es.search.call_args)

    def test_text_plus_term_filters(self):
        self.store.search_with_filters(
            "海边", {"season": "夏天", "year": 2024}, top_k=10
        )
        body = self._search_body()
        self.assertIn("must", body["query"]["bool"])
        filt = body["query"]["bool"]["filter"]
        self.assertIn({"term": {"season": "夏天"}}, filt)
        self.assertIn({"term": {"year": 2024}}, filt)
        self.assertEqual(body["min_score"], 0.12)

    def test_date_range_filter(self):
        self.store.search_with_filters(
            "度假", {"start_date": "2024-06-01", "end_date": "2024-06-30"}
        )
        body = self._search_body()
        filt = body["query"]["bool"]["filter"]
        self.assertIn(
            {"range": {"datetime": {"gte": "2024-06-01", "lte": "2024-06-30"}}},
            filt,
        )

    def test_filter_only_no_min_score_and_sentinel(self):
        self.es.search.return_value = {
            "hits": {
                "max_score": None,
                "hits": [{"_source": {"photo_path": "/x.jpg"}, "_score": 0.0}],
            }
        }
        hits = self.store.search_with_filters(None, {"season": "夏天"})
        body = self._search_body()
        self.assertNotIn("min_score", body)
        self.assertNotIn("must", body["query"]["bool"])
        self.assertEqual(hits[0]["score"], 0.5)  # filter-only sentinel

    def test_match_all_when_no_query_no_filters(self):
        self.store.search_with_filters(None, {})
        body = self._search_body()
        self.assertEqual(body["query"], {"match_all": {}})

    def test_get_filtered_paths(self):
        paths = self.store.get_filtered_paths({"season": "夏天"}, top_k=5)
        self.assertEqual(paths, ["/x.jpg"])
        self.assertEqual(self._search_body()["size"], 5)

    def test_filter_failure_degrades_to_empty(self):
        self.es.search.side_effect = Exception("cluster down")
        self.assertEqual(
            self.store.search_with_filters("海边", {"year": 2024}), []
        )


class AppWiringTest(unittest.TestCase):
    def test_backend_unavailable_degrades_to_none(self):
        """KEYWORD_BACKEND=elasticsearch without the client package (this
        image) must fail soft to a disabled keyword channel, exactly like
        the reference composition root (main.py:114-127)."""
        import tempfile

        from photo_search_engine_tpu.api.app import initialize_services
        from photo_search_engine_tpu.config import get_config

        with tempfile.TemporaryDirectory() as tmp:
            config = dict(get_config())
            config.update(
                {
                    "KEYWORD_BACKEND": "elasticsearch",
                    "ELASTICSEARCH_HOST": "127.0.0.1",
                    "ELASTICSEARCH_PORT": 59999,
                    "PHOTO_DIR": tmp,
                    "DATA_DIR": tmp,
                    "INDEX_PATH": f"{tmp}/idx.npy",
                    "METADATA_PATH": f"{tmp}/meta.json",
                    "KEYWORD_INDEX_PATH": f"{tmp}/kw.json",
                    "STATUS_PATH": f"{tmp}/status.json",
                    "MESH_DEVICES": 0,
                }
            )
            services = initialize_services(config)
            self.assertIsNone(services["keyword_index"])
            self.assertIsNotNone(services["searcher"])


if __name__ == "__main__":
    unittest.main()
