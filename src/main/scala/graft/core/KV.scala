package graft.core

/** The reference's single record type: untyped string key-value pairs
  * (ref: mr/worker.go:20-23 `type KeyValue struct { Key, Value string }`).
  */
final case class KV(key: String, value: String)
