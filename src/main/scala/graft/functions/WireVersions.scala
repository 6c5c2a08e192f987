package graft.functions

import java.nio.ByteBuffer

import WireHeaders.{putUvarint, getUvarint, putCompactString, getCompactString,
  putCompactNullableString, getCompactNullableString, putCompactArrayLen,
  getCompactArrayLen, putEmptyTags, getTags, compactStringSize, uvarintSize,
  readLegacyBytes}

/**
 * The big-five request serdes across their FULL declared version
 * ranges — the reference handles every version from min to max per
 * `kafka/server/handlers/handlers.h:71-112`, with the per-field
 * version gates declared in `kafka/protocol/schemata`:
 *
 *  - Produce 0-8 (no flexible): `transactional_id` v3+ (nullable).
 *  - Fetch 0-11 (no flexible): `max_bytes` v3+, `isolation_level`
 *    v4+, `session_id`/`session_epoch` v7+, per-partition
 *    `current_leader_epoch` v9+ and `log_start_offset` v5+,
 *    `forgotten_topics_data` v7+, `rack_id` v11+.
 *  - ListOffsets 0-5 (no flexible): `isolation_level` v2+,
 *    `current_leader_epoch` v4+, `max_num_offsets` v0 ONLY.
 *  - OffsetCommit 0-8 (flexible 8+): `generation_id`/`member_id` v1+,
 *    `group_instance_id` v7+ (nullable), `retention_time_ms` v2-4,
 *    per-partition `committed_leader_epoch` v6+ and
 *    `commit_timestamp` v1 only.
 *  - JoinGroup 0-6 (flexible 6+): `rebalance_timeout_ms` v1+,
 *    `group_instance_id` v5+ (nullable).
 *
 * Each serde decodes to a NORMALIZED superset request: fields absent
 * at a version come back as the schema's declared defaults (so an
 * old-client frame means exactly what the reference's handler would
 * see). Flexible versions switch strings/arrays to compact form and
 * add per-struct tag buffers (KIP-482).
 */
object WireVersions extends WireVersionsIngest with WireVersionsGroups
  with WireVersionsTxn with WireVersionsAdmin
