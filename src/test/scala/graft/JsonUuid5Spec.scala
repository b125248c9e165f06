package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.JsonUuid5

/** Bit-exactness against CPython:
  * expected values generated with
  * `uuid.uuid5(uuid.NAMESPACE_DNS, json.dumps(obj, sort_keys=True))`
  * (the reference's json_to_uuid, utils.py:6-9). */
class JsonUuid5Spec extends AnyFunSuite {

  test("uuid5 matches python uuid.uuid5(NAMESPACE_DNS, ...)") {
    // python: uuid.uuid5(uuid.NAMESPACE_DNS, 'www.example.org')
    assert(JsonUuid5.uuid5("www.example.org") === "74738ff5-5367-5958-9aee-98fffdcd1876")
  }

  test("canonical json matches python json.dumps(sort_keys=True)") {
    assert(JsonUuid5.canonicalize("""{"b":"x","a":1}""") === """{"a": 1, "b": "x"}""")
    assert(JsonUuid5.canonicalize("""{}""") === "{}")
    // ensure_ascii: é escapes to backslash-u00e9, exactly as python json.dumps
    assert(JsonUuid5.canonicalize("""{"n":[1,2,[3,"four"]],"s":"Seed Pokémon"}""") ===
      """{"n": [1, 2, [3, "four"]], "s": "Seed Pok""" + "\\u00e9" + """mon"}""")
  }

  test("json uuid5 content hash matches python end-to-end") {
    // expected values precomputed with CPython 3.11 uuid/json
    assert(JsonUuid5.jsonUuid5("""{"a": 1, "b": "x"}""") ===
      "e9a60761-e3e9-54df-941a-081b855fcba3")
    // key order insensitive (dedup key property)
    assert(JsonUuid5.jsonUuid5("""{"b": "x", "a": 1}""") ===
      "e9a60761-e3e9-54df-941a-081b855fcba3")
    assert(JsonUuid5.jsonUuid5("""{}""") === "f8cedbe4-72a8-53c3-922d-4cc8730f4c2d")
    // nested objects, arrays, unicode (pokemon-fixture shapes)
    assert(JsonUuid5.jsonUuid5(
      """{"id":1,"name":{"english":"Bulbasaur","japanese":"フシギダネ"},"type":["Grass","Poison"]}""") ===
      "40021c32-10cf-5401-b6c6-17459db07e13")
    assert(JsonUuid5.jsonUuid5("""{"n":[1,2,[3,"four"]],"s":"Seed Pokémon"}""") ===
      "ac6643cd-2b0c-51fd-8f36-06fe7bfabfcd")
    assert(JsonUuid5.jsonUuid5(
      """{"neg":-5,"big":123456789012345,"bool":true,"none":null}""") ===
      "76aac48b-e909-509b-9066-3853eed750d9")
  }
}
