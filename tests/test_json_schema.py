"""The shipped JSON schema validates real `info -d` dumps.

The reference ships src/mash/schema-1.0.0.json as the machine-readable
contract for its dump; ours (mash_tpu/io/schema-1.0.0.json) describes
the format the writer ACTUALLY emits (the reference's schema is stale:
kmerSize/seqLength/string-hashes vs the writer's kmer/length/integer
hashes).
"""

import json
import os

import jsonschema
import pytest

SCHEMA = os.path.join(
    os.path.dirname(__file__), "..", "mash_tpu", "io",
    "schema-1.0.0.json",
)
GOLD = "/root/reference/test/ref/genomes.json"


def _schema():
    with open(SCHEMA) as f:
        return json.load(f)


def test_schema_file_is_valid_jsonschema():
    jsonschema.Draft7Validator.check_schema(_schema())


@pytest.mark.skipif(
    not os.path.exists(GOLD), reason="reference goldens unavailable"
)
def test_reference_golden_dump_validates():
    with open(GOLD) as f:
        doc = json.load(f)
    jsonschema.validate(doc, _schema())


@pytest.mark.skipif(
    not os.path.exists(GOLD), reason="reference goldens unavailable"
)
def test_our_regenerated_dump_validates_and_roundtrips():
    from mash_tpu.io.formatting import json_dump, parse_json_dump

    params, refs = parse_json_dump(open(GOLD).read())
    out = json_dump(params, refs)
    doc = json.loads(out)
    jsonschema.validate(doc, _schema())
    assert doc["sketches"][0]["name"] == "genome1.fna"


def test_schema_rejects_missing_required():
    doc = {"kmer": 21}
    with pytest.raises(jsonschema.ValidationError):
        jsonschema.validate(doc, _schema())
