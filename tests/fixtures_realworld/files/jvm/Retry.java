package jvm;

import java.lang.annotation.ElementType;
import java.lang.annotation.Retention;
import java.lang.annotation.RetentionPolicy;
import java.lang.annotation.Target;

/** Annotation type plus its processor — the wave-4 @interface shape. */
@Retention(RetentionPolicy.RUNTIME)
@Target(ElementType.METHOD)
public @interface Retry {
    int attempts() default 3;

    long backoffMillis() default 100L;
}

class RetryProcessor {
    // wave-8 shape: a JDK-15 text block — its body (call-shaped usage
    // text, a decl-shaped line) is string DATA, never mentions
    static final String USAGE = """
        retry(attempts) wraps call(target);
        void ghost() {
        """;

    private final java.util.function.IntUnaryOperator backoff = n -> n * 2;

    static int resolveAttempts(Retry r) {
        return Math.max(1, r.attempts());
    }
}
