package graft.diffy

/** Descriptor-shaped fixture for protobuf-semantics testing WITHOUT a
  * protobuf runtime (the sandbox has none): the reference's TestRecord
  * surface (ratatool-common test protos — an optional nested message and a
  * repeated-fields message) modeled as case classes whose Spark encoding
  * is a nullable struct per message. Proto2 `hasField` presence maps to
  * struct/field nullability, which is exactly the information
  * `DiffOptions(messagePresence = true)` consumes. Used by the
  * `proto_semantics` gate and ProtoSemanticsSpec to replay
  * ProtoBufDiffyTest.scala:31-133 goldens through the generic Row differ. */
object ProtoFixture {

  /** OptionalNestedRecord analog: every field presence-tracked. */
  final case class Onr(
      int32_field: Option[Int],
      int64_field: Option[Long],
      string_field: Option[String])

  /** RepeatedNestedRecord analog: repeated fields are never null in proto,
    * only empty — hence Seq, not Option[Seq]. */
  final case class Rep(
      int32_field: Seq[Int],
      int64_field: Seq[Long],
      string_field: Seq[String])

  /** TestRecord analog keyed by scenario name. */
  final case class Rec(
      k: String,
      optional_nested_field: Option[Onr],
      repeated_fields: Option[Rep])
}
