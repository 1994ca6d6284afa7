package graft.sqlx

/** Thrown by the front door's grant enforcement (reference:
  * core/trino-main io/trino/spi/security AccessDeniedException — message
  * prefix "Access Denied:", surfaced to clients as PERMISSION_DENIED). */
final class AccessDeniedException(msg: String)
  extends RuntimeException(s"Access Denied: $msg")
