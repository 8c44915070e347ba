PREFIX ex: <http://ex/>
DELETE WHERE { ex:a ?p ?o }
